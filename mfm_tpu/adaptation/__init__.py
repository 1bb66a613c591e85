from mfm_tpu.adaptation.chain_adaptation import (
    AdaptState,
    cross_chain,
    parallel_eca,
)
from mfm_tpu.adaptation.optimize import optimize
from mfm_tpu.adaptation.atess import atess
from mfm_tpu.adaptation.msc import msc
from mfm_tpu.adaptation.msc_mala import msc_mala

__all__ = [
    "AdaptState",
    "cross_chain",
    "parallel_eca",
    "optimize",
    "atess",
    "msc",
    "msc_mala",
]
