"""Profiling helpers (capability the reference lacks — SURVEY.md section 5
notes it has wall-clock timing only).

``trace`` wraps a block in a jax.profiler trace whose dump can be opened in
TensorBoard / Perfetto; ``timed`` measures steady-state wall clock of a
jitted callable with compile excluded.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: with trace("/tmp/trace"): run_chunk(...)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, repeats: int = 3, warmup: int = 1):
    """(mean seconds, last output) of fn(*args), post-compile."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.time()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - start) / repeats, out
