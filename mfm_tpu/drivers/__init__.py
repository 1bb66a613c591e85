from mfm_tpu.drivers.eval import (
    aggregate_seeds,
    check_floor,
    evaluate_samples,
    report_row,
)
from mfm_tpu.drivers.mfm import (
    MFMRun,
    build_mfm,
    next_beta,
    run_mfm,
    sample_flow,
    sample_flow_defensive,
    sample_flow_move,
    tempered_value_and_score,
)
from mfm_tpu.drivers.smc_run import SMCRunResult, run_smc

__all__ = [
    "aggregate_seeds",
    "check_floor",
    "evaluate_samples",
    "report_row",
    "MFMRun",
    "build_mfm",
    "next_beta",
    "run_mfm",
    "sample_flow",
    "sample_flow_defensive",
    "sample_flow_move",
    "tempered_value_and_score",
    "SMCRunResult",
    "run_smc",
]

from mfm_tpu.drivers.multi_seed import SeedSweep, run_mfm_seeds  # noqa: E402

__all__ += ["SeedSweep", "run_mfm_seeds"]
