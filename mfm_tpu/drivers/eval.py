"""Shared end-of-run evaluation: log-density, Stein discrepancies, MMD.

Parity with the reference's final metric block
(/root/reference/exe_flow_matching.py:462-490 and exe_others.py:301-340):
``logpdf`` / ``logpdf*`` (flow vs IS-corrected samples), KSD U/V statistics,
MMD vs ground-truth samples when the target has an exact sampler, and the
``check`` floor computed from real samples against themselves.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp

from mfm_tpu.diagnostics import max_mean_disc, stein_disc
from mfm_tpu.targets.base import Target


def evaluate_samples(
    target: Target,
    flow_samples: jax.Array,
    exact_samples: jax.Array,
    real_samples: Optional[jax.Array] = None,
    log_weights: Optional[jax.Array] = None,
    pallas_metrics: Optional[bool] = None,
) -> dict:
    """Compute the reference metric row for one run.

    ``log_weights`` (optional, per flow sample): adds importance-WEIGHTED
    Stein statistics of the flow samples — the duplication-free view of the
    IS-corrected distribution (new capability; see diagnostics.stein_disc).

    ``pallas_metrics``: use the fused Pallas pairwise kernels — measured
    2-5x faster at the 12,800-sample eval size on v5e (d=64: 2.0x, d=1600:
    5.1x, MMD: 1.5x; RESULTS_raw_pairwise_pallas.json) with coarser f32
    accumulation (KSD abs deviation ~3e-4 at d=64, ~0.03 at d=1600).
    ``None`` (default) resolves to the backend AND the regime: ON when the
    default backend is TPU (where the kernels compile natively and the
    speedup is real) and dim < 1024; OFF elsewhere (CPU/tests keep the
    pure-XLA path; on non-TPU the Pallas kernels would only run in slow
    interpreter mode anyway) and OFF at dim >= 1024, where the Pallas
    path's coarser accumulation (~0.03 abs KSD at d=1600) is the same
    order as the near-floor KSD values being reported (move-corrected
    pines ~0.05) and would silently shift the headline quality metric.
    Pass an explicit ``True`` to force the fast path at high dim. The
    weighted-Stein variant always uses the XLA path. Every row records
    which kernel path produced it (``metrics_kernel``).

    Env override ``MFM_PALLAS_METRICS=0|1`` beats the auto rule (not an
    explicit argument) — the operational quarantine knob for the wedge
    experiment of VERDICT r4 weak #2 / WEDGE_LOG.jsonl.
    """
    if pallas_metrics is None:
        env = os.environ.get("MFM_PALLAS_METRICS")
        if env is not None:
            pallas_metrics = env not in ("0", "false", "")
        else:
            pallas_metrics = (
                jax.default_backend() == "tpu"
                and flow_samples.shape[-1] < 1024
            )
    if pallas_metrics:
        from mfm_tpu.ops.pairwise_pallas import (
            max_mean_disc_pallas as mmd_fn,
            stein_disc_pallas as stein_fn,
        )
    else:
        stein_fn, mmd_fn = stein_disc, max_mean_disc

    out = {}
    out["metrics_kernel"] = "pallas" if pallas_metrics else "xla"
    out["logpdf"] = float(jnp.mean(target.log_prob(flow_samples)))
    u, v = stein_fn(flow_samples, target.score)
    out["stein_u"], out["stein_v"] = float(u), float(v)

    out["logpdf_star"] = float(jnp.mean(target.log_prob(exact_samples)))
    u_, v_ = stein_fn(exact_samples, target.score)
    out["stein_u_star"], out["stein_v_star"] = float(u_), float(v_)

    if log_weights is not None:
        w = jnp.exp(log_weights - jnp.max(log_weights))
        uw, vw = stein_disc(flow_samples, target.score, weights=w)
        out["stein_u_weighted"], out["stein_v_weighted"] = float(uw), float(vw)

    if real_samples is not None:
        out["mmd"] = float(mmd_fn(real_samples, flow_samples))
        out["mmd_star"] = float(mmd_fn(real_samples, exact_samples))
    else:
        out["mmd"] = out["mmd_star"] = 0.0
    return out


def check_floor(target: Target, real_samples: jax.Array) -> dict:
    """Sanity floor: metrics of exact samples against themselves
    (reference --check mode, exe_flow_matching.py:462-467)."""
    u, v = stein_disc(real_samples, target.score)
    return {
        "logpdf_real": float(jnp.mean(target.log_prob(real_samples))),
        "stein_u_real": float(u),
        "stein_v_real": float(v),
        "mmd_real": float(max_mean_disc(real_samples, real_samples)),
    }


def report_row(cfg, metrics: dict, train_time: float) -> list:
    """The reference's summary-table row layout
    (exe_flow_matching.py:477-488)."""
    row = [
        cfg.mcmc_per_flow_steps,
        cfg.learning_iter,
        train_time,
        metrics["logpdf"],
        metrics["logpdf_star"],
        metrics["stein_u"],
        metrics["stein_u_star"],
        metrics["stein_v"],
        metrics["stein_v_star"],
    ]
    if metrics.get("mmd") is not None:
        row += [metrics["mmd"], metrics["mmd_star"]]
    return row


def aggregate_seeds(rows: list) -> dict:
    """mean +/- 1.96 sigma over seeds (reference multi_modal.py:133-143)."""
    import numpy as np

    arr = np.asarray(rows, dtype=np.float64)
    return {
        "mean": arr.mean(axis=0),
        "ci95": 1.96 * arr.std(axis=0),
    }
