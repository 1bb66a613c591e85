"""Result visualization: pair scatters, density contours, phi-four field
plots, 4-mode flow progressions.

Parity with the reference figure block
(/root/reference/exe_flow_matching.py:492-557, plot_contours :564-575).
Figures are returned (and optionally saved) instead of being pushed to a
mandatory wandb table.
"""

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_contours(ax_list, log_prob_fn: Callable, lim, grid_width=400, levels=50):
    """Overlay target log-density contours on 2-D axes
    (reference plot_contours, exe_flow_matching.py:564-575)."""
    grid = jnp.linspace(lim[0], lim[1], grid_width)
    xx, yy = jnp.meshgrid(grid, grid, indexing="ij")
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=1)
    vals = jnp.maximum(log_prob_fn(pts), -1000.0).reshape(grid_width, grid_width)
    for ax in ax_list:
        ax.contour(np.asarray(xx), np.asarray(yy), np.asarray(vals), levels=levels)


def pair_scatter(
    flow_samples,
    exact_samples,
    lim=None,
    log_prob_fn: Optional[Callable] = None,
    max_dims: int = 10,
    grid_width: int = 400,
    levels: int = 50,
):
    """One figure per (x0, x_i) pair, flow vs IS-corrected samples side by
    side (reference exe_flow_matching.py:513-532). Returns figures."""
    plt = _plt()
    flow_samples = np.asarray(flow_samples)
    exact_samples = np.asarray(exact_samples)
    dim = flow_samples.shape[1]
    figs = []
    for i in range(min(dim - 1, max_dims)):
        fig, ax = plt.subplots(1, 2, figsize=(11, 4))
        ax[1].set_title(r"$\hat{\pi}$ (flow)")
        ax[0].set_title(r"$\pi$ (IS-corrected)")
        ax[1].plot(flow_samples[:, 0], flow_samples[:, i + 1], ".", alpha=0.2)
        ax[0].plot(exact_samples[:, 0], exact_samples[:, i + 1], ".", alpha=0.2)
        if lim is not None:
            plt.setp(ax, xlim=lim, ylim=lim)
        if dim == 2 and log_prob_fn is not None and lim is not None:
            plot_contours(ax, log_prob_fn, lim, grid_width, levels)
        figs.append(fig)
    return figs


def phi_four_fields(flow_samples, exact_samples, lim=(-1.6, 1.6)):
    """Lattice field overlays with boundary padding
    (reference exe_flow_matching.py:492-510)."""
    plt = _plt()
    fig, ax = plt.subplots(1, 2, figsize=(11, 4), sharex=True, sharey=True)
    for axis, samples, title in (
        (ax[0], exact_samples, r"$\pi$"),
        (ax[1], flow_samples, r"$\hat{\pi}$"),
    ):
        padded = np.pad(np.asarray(samples), ((0, 0), (1, 1)))
        for row in padded:
            axis.plot(row, color="red", alpha=0.1)
        axis.set_title(title)
        axis.set_xlabel(r"$d$")
        axis.set_ylabel(r"$\phi$")
    plt.setp(ax, xlim=[0, padded.shape[1] - 1], ylim=list(lim))
    return fig


def flow_progression(
    transport,
    params,
    u,
    save_ts: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
    key: Optional[jax.Array] = None,
):
    """Forward transport snapshots at intermediate times — the 4-mode
    progression plot (reference exe_flow_matching.py:534-545)."""
    plt = _plt()
    traj = np.asarray(transport.forward_traj(params, u, list(save_ts), key))
    n_col = traj.shape[0]
    fig, ax = plt.subplots(1, n_col, figsize=(5 * n_col, 3))
    for i in range(n_col):
        ax[i].plot(traj[i, :, 0], traj[i, :, 1], ".", alpha=0.2)
        ax[i].set_title(f"t={save_ts[i]:.2f}")
    return fig


def save_figs(figs, prefix: str):
    paths = []
    for i, fig in enumerate(np.atleast_1d(figs)):
        path = f"{prefix}_{i}.png"
        fig.savefig(path, dpi=120, bbox_inches="tight")
        paths.append(path)
    return paths


def make_run_figures(target, cfg, flow_samples, exact_samples, run=None,
                     key=None, max_scatter: int = 2048):
    """End-of-run figure set, keyed by name (reference
    exe_flow_matching.py:492-559):

    - ``pairs``        per-(x0, x_i) scatter of flow vs IS-corrected samples,
                       first 10 dims, 2-D contour overlay when available
    - ``fields``       phi-four lattice field overlay (phi-four only)
    - ``progression``  forward-transport snapshots at 5 times (2-D targets
                       with a trained MFM run only)

    ``run`` is an ``MFMRun`` (for the progression's transport/params/ref);
    figure creation is host-side matplotlib — subsample the scatter inputs
    to ``max_scatter`` points so a 12.8k-sample eval doesn't emit 10 MB
    PNGs."""
    figs = {}
    fs = np.asarray(flow_samples)[:max_scatter]
    es = np.asarray(exact_samples)[:max_scatter]
    log_prob = target.log_prob if target.dim == 2 else None
    figs["pairs"] = pair_scatter(
        fs, es, lim=cfg.lim, log_prob_fn=log_prob,
        grid_width=cfg.grid_width, levels=cfg.levels,
    )
    if cfg.example == "phi-four":
        # reference plots the fields of 100 samples (:497)
        figs["fields"] = phi_four_fields(fs[:100], es[:100])
    if target.dim == 2 and run is not None:
        if key is None:
            key = jax.random.PRNGKey(0)
        u = run.ref_dist.sample(key, (min(1024, fs.shape[0]),))
        figs["progression"] = flow_progression(
            run.transport, run.train.params, u, key=jax.random.fold_in(key, 1)
        )
    return figs
