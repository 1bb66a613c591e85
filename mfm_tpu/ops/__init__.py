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
