"""Roofline accounting: tie measured wall-clock to hardware ceilings.

The reference publishes no utilization numbers at all (SURVEY.md section 6);
round-3 review asked for perf claims anchored to the chip's roofline rather
than to a same-host CPU ratio. This module does that reproducibly:

- FLOP and byte counts come from XLA's own cost model of the COMPILED
  executable (``compiled.cost_analysis()``), not from hand-derived formulas
  that drift when the kernel changes;
- wall-clock comes from executing the same compiled object;
- ceilings are the chip's datasheet numbers (table below), selected by the
  device kind at runtime.

The % figures are honest bounds, with three caveats stated here once:
XLA's "bytes accessed" counts logical operand/result traffic, which
over-counts fused intermediates that never touch HBM (so %HBM is an upper
bound on achieved bandwidth); f32 matmuls on the MXU run as multi-pass
bf16 (so %MXU uses the bf16 peak and f32 GEMM work shows at ~1/3-1/6 of
it even when the unit is saturated); and XLA's cost model counts a
``while``/``scan`` BODY exactly once regardless of trip count (measured:
a 1-step and a 100-step scan of the same 256x256 matmul both report
33.5 MFLOP), so callers must pass the loop trip count as ``loop_reps``
when the measured fn is scan-dominated.
"""

import time
from typing import Callable, NamedTuple, Optional

import jax

# chip -> (peak dense FLOP/s (bf16 MXU), peak HBM bytes/s). Datasheet
# numbers; extend as new device kinds appear. v5 lite == v5e.
_CHIP_PEAKS = {
    "TPU v5 lite": (394.0e12 / 2, 819.0e9),  # 197 TFLOP/s bf16, 819 GB/s
    "TPU v5e": (197.0e12, 819.0e9),
    "TPU v5p": (459.0e12, 2765.0e9),
    "TPU v4": (275.0e12, 1228.0e9),
    "TPU v6e": (918.0e12, 1640.0e9),
}


class RooflineReport(NamedTuple):
    name: str
    flops: float  # XLA cost model, per execution
    bytes_accessed: float  # XLA cost model, per execution (upper bound)
    seconds: float  # measured median wall-clock per execution
    achieved_flops_per_sec: float
    achieved_bytes_per_sec: float
    pct_peak_flops: Optional[float]  # None off-TPU (no ceiling to cite)
    pct_peak_bandwidth: Optional[float]
    bound: str  # 'compute' | 'memory' per the cost model's intensity

    def as_dict(self) -> dict:
        return {k: getattr(self, k) for k in self._fields}


def device_peaks(device=None):
    """(peak_flops, peak_bytes_per_sec) for the device, or (None, None)
    when the chip is unknown (e.g. CPU test hosts)."""
    device = device or jax.devices()[0]
    return _CHIP_PEAKS.get(getattr(device, "device_kind", ""), (None, None))


def roofline(name: str, fn: Callable, *args, repeats: int = 3,
             loop_reps: int = 1,
             lower_kwargs: Optional[dict] = None) -> RooflineReport:
    """Compile ``fn(*args)``, pull FLOPs/bytes from XLA's cost analysis,
    measure median execution time, and situate it against the chip peaks.

    ``loop_reps``: trip count of the dominant ``lax.scan``/``while`` inside
    ``fn``. XLA's cost model counts a loop body once (module docstring), so
    the reported FLOPs/bytes are multiplied by this. Slightly over-counts
    the outside-the-loop part (counted once by XLA, scaled here anyway),
    which is negligible exactly when the loop dominates — the only regime
    where a roofline number is meaningful."""
    compiled = (
        jax.jit(fn, **(lower_kwargs or {})).lower(*args).compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) * loop_reps
    bytes_accessed = float(cost.get("bytes accessed", 0.0)) * loop_reps

    def _sync(out):
        # value fetch, not block_until_ready: over a remote device tunnel
        # the latter can return before execution finishes (bench.py::_sync)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jax.numpy.asarray(leaf).ravel()[0])

    _sync(compiled(*args))
    times = []
    for _ in range(repeats):
        t0 = time.time()
        _sync(compiled(*args))
        times.append(time.time() - t0)
    seconds = sorted(times)[len(times) // 2]

    peak_f, peak_b = device_peaks()
    ach_f = flops / seconds
    ach_b = bytes_accessed / seconds
    # which wall is closer, by the cost model's arithmetic intensity
    if peak_f and peak_b:
        bound = "compute" if (flops / max(bytes_accessed, 1.0)) > (
            peak_f / peak_b) else "memory"
    else:
        bound = "memory" if bytes_accessed > flops else "compute"
    return RooflineReport(
        name=name,
        flops=flops,
        bytes_accessed=bytes_accessed,
        seconds=seconds,
        achieved_flops_per_sec=ach_f,
        achieved_bytes_per_sec=ach_b,
        pct_peak_flops=(100.0 * ach_f / peak_f) if peak_f else None,
        pct_peak_bandwidth=(100.0 * ach_b / peak_b) if peak_b else None,
        bound=bound,
    )
