from mfm_tpu.diagnostics.metrics import (
    autocorrelation,
    effective_sample_size,
    max_mean_disc,
    stein_disc,
)

__all__ = [
    "autocorrelation",
    "effective_sample_size",
    "max_mean_disc",
    "stein_disc",
]
