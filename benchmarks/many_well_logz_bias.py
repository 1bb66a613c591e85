"""Root-cause the many-well flow-SMC logZ bias: discrete-map logdet error.

The inner-moves dose-response (benchmarks/many_well_inner_moves.py) showed
the -1.3 +/- 0.3 nat bias on the d=32 many-well logZ (truth 164.696 by
quadrature) is FLAT in the number of inner MCMC moves — refuting the
under-equilibration attribution in RESULTS.md. The remaining suspect is the
transport's log-determinant: flows/cnf.py integrates the field divergence
along the fixed-grid RK4 trajectory, which is a 4th-order estimate of the
*continuous* flow's logdet — but the particles are pushed by the *discrete*
RK4 map, whose exact log-Jacobian differs by a deterministic O(h^4)
function of u. Since the pullback density used for tempering is
q0(u) exp(ell(u)) with ell = log pi(T_h(u)) + logdet_est(u) - log q0(u),
the population logZ it anneals to is

    log Z_est = log Z + log E_{rho1}[exp(Delta)],   Delta = logdet_est - logdet_disc

where logdet_disc = log|det dT_h/du| is the exact Jacobian of the discrete
map. A nonzero mean Delta is a *bias*, invisible to seed replication.

This script measures it three ways on one trained many-well flow (seed 0):

1. Direct Delta: for M latents (both fresh q0 draws and annealed rho1
   particles), logdet_est (augmented-ODE divergence integral) vs
   logdet_disc (slogdet of jacfwd of the discrete forward map — exact at
   d=32). Prediction if this is the mechanism: mean Delta under rho1
   ~ -1.3 nats, matching the measured logZ bias.
2. Grid dose-response of Delta at n_steps in {24, 48, 96}: O(h^4) decay.
3. End-to-end: flow-SMC logZ (num_mcmc_steps=4, 3 seeds) with the
   transport rebuilt at n_steps in {48, 96}; the bias should track the
   Delta means from (2).

Usage: python benchmarks/many_well_logz_bias.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfm_tpu.cli import make_target
from mfm_tpu.config import preset
from mfm_tpu.drivers import run_mfm
from mfm_tpu.drivers.flow_smc import run_flow_smc
from mfm_tpu.flows.cnf import make_transport


def quadrature_truth():
    g = np.linspace(-4.0, 4.0, 400001)
    lp = -(g**4) + 6.0 * g**2 + 0.5 * g
    log_i = lp.max() + np.log(np.trapezoid(np.exp(lp - lp.max()), g))
    return 16.0 * (log_i + 0.5 * np.log(2.0 * np.pi))


def delta_stats(transport, params, u, batch=64):
    """(mean, std, mean_exp_delta) of Delta = logdet_est - logdet_disc."""

    def fwd_single(u1):
        x, _ = transport.forward(params, u1[None], None)
        return x[0]

    def one(u1):
        jac = jax.jacfwd(fwd_single)(u1)
        _, logdet_disc = jnp.linalg.slogdet(jac)
        return logdet_disc

    logdet_disc = []
    logdet_est = []
    for i in range(0, u.shape[0], batch):
        ub = u[i : i + batch]
        logdet_disc.append(jax.vmap(one)(ub))
        logdet_est.append(transport.forward(params, ub, None)[1])
    d_disc = jnp.concatenate(logdet_disc)
    d_est = jnp.concatenate(logdet_est)
    delta = d_est - d_disc
    return {
        "mean": float(jnp.mean(delta)),
        "std": float(jnp.std(delta)),
        # log E[exp(Delta)] is the exact first-order logZ tilt
        "log_mean_exp": float(
            jax.scipy.special.logsumexp(delta) - jnp.log(delta.shape[0])
        ),
    }


def main(out_path="RESULTS_raw_many_well_logz_bias.json"):
    logz_true = quadrature_truth()
    cfg = preset("many-well", seed=0)
    target = make_target("many-well")

    # resume: the tunnel wedges after ~10 min of sustained occupancy
    # (WEDGE_LOG.jsonl), so finished delta grids / e2e rows are reused
    # across processes; the seed-0 retrain is deterministic.
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)

    t0 = time.time()
    run = run_mfm(target, cfg)
    jax.block_until_ready(run.train.params)
    t_train = time.time() - t0
    params = run.train.params

    # rho1-ish latents: one quick anneal at the preset grid (skipped on
    # resume once every delta grid is measured — rho1_u feeds only those)
    deltas_done = all(str(n) in prev.get("delta", {}) for n in (24, 48, 96))
    if deltas_done:
        base_log_z = prev.get("base_log_z_grid24")
        rho1_u = None
    else:
        base = run_flow_smc(
            target, cfg, run.transport, params, run.ref_dist,
            key=jax.random.PRNGKey(100), n_particles=4096, n_steps=32,
            num_mcmc_steps=4,
        )
        base_log_z = float(base.log_z)
        rho1_u = base.latent[:256]
    q0_u = run.ref_dist.sample(jax.random.PRNGKey(7), (256,))

    out = {
        "log_z_true": float(logz_true),
        "train_time_s": round(t_train, 2),
        "base_log_z_grid24": base_log_z,
        "delta": dict(prev.get("delta", {})),
        "e2e": list(prev.get("e2e", [])),
    }

    # (1)+(2): Delta under q0 and rho1 at three grids
    for n_steps in (24, 48, 96):
        if str(n_steps) in out["delta"]:
            print(n_steps, "reusing", out["delta"][str(n_steps)], flush=True)
            continue
        tr = make_transport(
            run.apply_fn, divergence=cfg.divergence, n_steps=n_steps,
            method=cfg.ode_method,
        )
        out["delta"][str(n_steps)] = {
            "q0": delta_stats(tr, params, q0_u),
            "rho1": delta_stats(tr, params, rho1_u),
        }
        print(n_steps, out["delta"][str(n_steps)], flush=True)
        with open(out_path, "w") as fh:  # survive a mid-grid device fault
            json.dump(out, fh, indent=2)

    # (3): end-to-end invariance check at one finer grid. The direct Delta
    # measurement in (1)-(2) already bounds the discrete-logdet effect on
    # the e2e logZ at ~2e-4 nats, so exact_disc / 96-step e2e arms would be
    # redundant confirmations — and the exact_disc transport at 4096
    # particles ((4096, 32, 32) batched slogdet + 32-column linearize)
    # reproducibly kernel-faults the TPU tunnel (WEDGE_LOG.jsonl). One
    # standard-divergence 48-step arm remains: prediction under the
    # estimator-tilt mechanism (not the ODE grid) is bias UNCHANGED.
    e2e_grid = [(48, cfg.divergence)]
    # per-process cell quota: the tunnel faults after ~10-12 min of
    # cumulative device work in ONE process (WEDGE_LOG.jsonl), so a driver
    # reruns this script (resuming from the artifact) until the grid is
    # full; exit code 3 = quota hit, more cells remain
    max_cells = int(os.environ.get("MFM_MAX_CELLS", "3"))
    new_cells = 0
    have = {(r["ode_steps"], r["divergence"], r["smc_seed"])
            for r in out["e2e"]}
    for n_steps, div in e2e_grid:
        tr = make_transport(
            run.apply_fn, divergence=div, n_steps=n_steps,
            method=cfg.ode_method,
        )
        for smc_seed in (100, 101, 102):
            if (n_steps, div, smc_seed) in have:
                continue
            if new_cells >= max_cells:
                print(f"cell quota ({max_cells}) hit; rerun to continue",
                      flush=True)
                sys.exit(3)
            new_cells += 1
            r = run_flow_smc(
                target, cfg, tr, params, run.ref_dist,
                key=jax.random.PRNGKey(smc_seed), n_particles=4096,
                n_steps=32, num_mcmc_steps=4,
                # the 48-step transport doubles per-eval cost vs the
                # preset grid the auto chunk assumes; ~8 temper steps
                # per execution keeps each call near the known-good
                # ~50 s (WEDGE_LOG.jsonl)
                chunk_steps=8,
            )
            jax.block_until_ready(r.samples)
            row = {
                "ode_steps": n_steps,
                "divergence": div,
                "smc_seed": smc_seed,
                "log_z": float(r.log_z),
                "bias": float(r.log_z) - float(logz_true),
                "lmbda": float(r.lmbda),
            }
            out["e2e"].append(row)
            print(row, flush=True)
            with open(out_path, "w") as fh:
                json.dump(out, fh, indent=2)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=2)
    for n_steps, div in e2e_grid:
        b = [r["bias"] for r in out["e2e"]
             if r["ode_steps"] == n_steps and r["divergence"] == div]
        print(
            f"grid {n_steps} ({div}): bias {np.mean(b):+.3f} "
            f"+/- {np.std(b):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
