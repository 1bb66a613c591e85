from mfm_tpu.kernels.base import (
    AdaptationAlgorithm,
    ChainInfo,
    ChainState,
    SamplingAlgorithm,
)
from mfm_tpu.kernels import mala

__all__ = [
    "AdaptationAlgorithm",
    "ChainInfo",
    "ChainState",
    "SamplingAlgorithm",
    "mala",
]
