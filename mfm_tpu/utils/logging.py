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

    def log_figures(self, figs: dict, subdir: str = "figs"):
        """Save named matplotlib figures as PNGs under the run dir and
        attach them to the wandb summary when enabled (the reference pushes
        its figure set to a mandatory wandb table,
        exe_flow_matching.py:559). ``figs`` maps name -> figure or list of
        figures. Returns the saved paths."""
        if not self.enabled:
            return []
        from mfm_tpu.drivers.plots import save_figs

        out_dir = os.path.join(self.run_dir or ".", f"{self.run_name}_{subdir}")
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for name, fig_or_list in figs.items():
            paths += save_figs(fig_or_list, os.path.join(out_dir, name))
        if self._fh is not None:
            self._fh.write(json.dumps({"_figures": paths}) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(
                {os.path.basename(p): self._wandb.Image(p) for p in paths}
            )
        logger.info("[%s] figures: %s", self.run_name, ", ".join(paths))
        return paths

    def log_per_iteration(self, stacked: dict):
        """Full-resolution metric dump: one record per training iteration
        from the scan's stacked metric arrays (MFMRun.metrics). Reference
        parity with the per-iteration wandb.log of loss / LR / acceptance
        (exe_flow_matching.py:442-449); opt-in because the default
        chunk-mean stream is what keeps the loop host-sync-free."""
        if not self.enabled or not stacked:
            return
        import numpy as np

        arrays = {k: np.asarray(v) for k, v in stacked.items()}
        n = len(next(iter(arrays.values())))
        for i in range(n):
            rec = {"iter": i + 1}
            rec.update({k: float(v[i]) for k, v in arrays.items()})
            if self._fh is not None:
                self._fh.write(json.dumps(rec) + "\n")
            if self._wandb is not None:
                self._wandb.log(rec, step=i + 1)
        if self._fh is not None:
            self._fh.flush()
        logger.info(
            "[%s] wrote %d per-iteration records (%s)",
            self.run_name, n, ", ".join(arrays),
        )

    def finish(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
