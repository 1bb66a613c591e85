"""Observability: metric logging with pluggable backends.

The reference hard-requires Weights & Biases (wandb.init per seed,
per-iteration wandb.log; /root/reference/multi_modal.py:123,
exe_flow_matching.py:449,559-560). Here wandb is **optional**: the default
backend writes JSONL to disk and mirrors a compact line to stdout, and a
wandb backend engages only when the package is importable and explicitly
requested. Loggers also absorb the reference's summary-table role
(exe_flow_matching.py:477-488).
"""

import json
import logging
import os
import time
from typing import Optional

logger = logging.getLogger("mfm_tpu")


class MetricLogger:
    """JSONL + stdout metric logger.

    log(dict)        per-chunk/step training metrics
    summary(dict)    final metric row
    """

    def __init__(
        self,
        run_dir: Optional[str] = None,
        run_name: str = "run",
        stdout_every: int = 1,
        use_wandb: bool = False,
        wandb_kwargs: Optional[dict] = None,
        primary_only: Optional[bool] = None,
    ):
        """``primary_only`` (default: auto) makes non-zero processes of a
        multi-controller run no-op: chunk metrics are replicated, so every
        controller would otherwise write identical JSONL/wandb records —
        N-fold duplication riding the DCN run. Pass False to force every
        process to log (e.g. to assert cross-controller metric identity)."""
        if primary_only is None:
            import jax

            primary_only = jax.process_count() > 1
        self.enabled = True
        if primary_only:
            import jax

            self.enabled = jax.process_index() == 0
        self.run_dir = run_dir
        self.run_name = run_name
        self.stdout_every = stdout_every
        self._n = 0
        self._fh = None
        self._wandb = None
        self._t0 = time.time()
        if not self.enabled:
            return
        if run_dir is not None:
            os.makedirs(run_dir, exist_ok=True)
            self._fh = open(os.path.join(run_dir, f"{run_name}.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                logger.warning("wandb requested but not installed; using JSONL only")

    def log(self, metrics: dict):
        if not self.enabled:
            return
        self._n += 1
        rec = {"_t": time.time() - self._t0, **metrics}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics)
        if self.stdout_every and self._n % self.stdout_every == 0:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            logger.info("[%s] %s", self.run_name, parts)

    def summary(self, metrics: dict):
        if not self.enabled:
            return
        rec = {"_summary": True, **metrics}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            for k, v in metrics.items():
                self._wandb.run.summary[k] = v
        logger.info("[%s] summary: %s", self.run_name, metrics)

    def finish(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
