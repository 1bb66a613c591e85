from mfm_tpu.kernels.base import (
    AdaptationAlgorithm,
    ChainInfo,
    ChainState,
    SamplingAlgorithm,
)
from mfm_tpu.kernels import cis, hmc, mala, nuts, proposal, tess

__all__ = [
    "AdaptationAlgorithm",
    "ChainInfo",
    "ChainState",
    "SamplingAlgorithm",
    "cis",
    "hmc",
    "mala",
    "nuts",
    "proposal",
    "tess",
]
