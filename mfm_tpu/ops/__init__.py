from mfm_tpu.ops.pairwise_pallas import (
    max_mean_disc_pallas,
    rbf_kernel_sum,
    stein_disc_pallas,
    stein_pairwise_sum,
)

__all__ = [
    "max_mean_disc_pallas",
    "rbf_kernel_sum",
    "stein_disc_pallas",
    "stein_pairwise_sum",
]

from mfm_tpu.ops.phi_four_pallas import phi_four_log_lik  # noqa: E402

__all__ += ["phi_four_log_lik"]
