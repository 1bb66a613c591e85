from mfm_tpu.kernels.base import (
    inference_loop,
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
    "inference_loop",
    "cis",
    "hmc",
    "mala",
    "nuts",
    "proposal",
    "tess",
]
