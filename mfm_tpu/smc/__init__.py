from mfm_tpu.smc import adaptive_tempered, base, ess, resampling, solvers, tempered
from mfm_tpu.smc.adaptive_tempered import adaptive_tempered_smc
from mfm_tpu.smc.base import SMCInfo, SMCState
from mfm_tpu.smc.distributed import (
    distributed_stratified,
    distributed_systematic,
    make_distributed_resampler,
)
from mfm_tpu.smc.resampling import (
    RESAMPLERS,
    get_resampler,
    multinomial,
    residual,
    stratified,
    systematic,
)
from mfm_tpu.smc.tempered import TemperedSMCState, tempered_smc

__all__ = [
    "adaptive_tempered",
    "base",
    "ess",
    "resampling",
    "solvers",
    "tempered",
    "adaptive_tempered_smc",
    "SMCInfo",
    "SMCState",
    "RESAMPLERS",
    "get_resampler",
    "multinomial",
    "residual",
    "stratified",
    "systematic",
    "TemperedSMCState",
    "tempered_smc",
    "distributed_stratified",
    "distributed_systematic",
    "make_distributed_resampler",
]
