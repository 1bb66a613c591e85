"""Does Hutchinson logdet noise bias the flow-SMC pines logZ upward?

Round-3 finding that motivates this: plain prior-to-posterior SMC has
*converged* at d=1600 — 501.8 +/- 0.1 nats across inner kernel (MALA/
NUTS), move budget (2-50 moves/temp), waste-free geometry, and particle
count (1024 -> 8192; RESULTS_raw_pines_plain_smc.json) — and the pines
LGCP posterior is log-concave, so that estimate is hard to distrust.
Flow-annealed SMC reads 503.6 +/- 0.3. The suspect for the ~1.8-nat
disagreement: flow-SMC's latent target embeds a *stochastic* logdet
(1-probe Hutchinson; flows/pullback.py caveat), i.e. it anneals to the
tilted density pi(T(u))|J(u)| e^{eps(u)}, and E[e^eps] = e^{var/2} > 1 —
an upward Jensen tilt of ~var(eps)/2 nats.

Two measurements:
1. var(eps): per-sample std of the Hutchinson logdet across independent
   probe keys, at latent points from q0 (prediction: std ~ 1.9 nats
   would explain the full gap).
2. the dose-response: flow-SMC logZ with K = 1, 4, 16 Gaussian probes
   and K = 1 Rademacher (variance ~ 2||offdiag||^2/K, so the tilt should
   shrink ~ 1/K; prediction: logZ descends toward the plain-SMC 501.8).

Usage: python benchmarks/pines_logz_probe_bias.py [--seeds 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--particles", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--mcmc-steps", type=int, default=5)
    ap.add_argument("--learning-iter", type=int, default=10_000)
    ap.add_argument("--noise-points", type=int, default=256)
    ap.add_argument("--noise-keys", type=int, default=32)
    ap.add_argument("--out", default="RESULTS_raw_pines_logz_probe_bias.json")
    args = ap.parse_args()

    from mfm_tpu.cli import make_target
    from mfm_tpu.config import preset
    from mfm_tpu.drivers.flow_smc import run_flow_smc
    from mfm_tpu.drivers.mfm import run_mfm
    from mfm_tpu.flows.cnf import make_transport

    cfg = preset(
        "pines", learning_iter=args.learning_iter,
        mcmc_per_flow_steps=100.0, adapt_step_size=True, alpha=0.8,
    )
    target = make_target("pines")
    run = run_mfm(target, cfg)
    print(f"trained: {run.train_time:.1f}s", flush=True)
    out = {"train_time": run.train_time, "config": vars(args)}

    # -- 1. probe-noise magnitude ------------------------------------------
    # explicitly the GAUSSIAN 1-probe transport: this measurement
    # quantifies the noise of the estimator the 503.6 figure used, and
    # run.transport now follows the preset (flipped to Rademacher as this
    # study's consequence), so it must not be used here
    gauss1 = make_transport(
        run.apply_fn, divergence=cfg.divergence, n_steps=cfg.ode_steps,
        method=cfg.ode_method, num_probes=1, probe_dist="gaussian",
    )
    u = run.ref_dist.sample(jax.random.PRNGKey(7), (args.noise_points,))

    @jax.jit
    def logdet_at(key):
        _, ld = gauss1.forward(run.train.params, u, key)
        return ld

    lds = np.stack([
        np.asarray(logdet_at(jax.random.PRNGKey(100 + i)))
        for i in range(args.noise_keys)
    ])  # (keys, points)
    per_point_std = lds.std(axis=0, ddof=1)
    out["probe_noise"] = {
        "per_point_std_mean": float(per_point_std.mean()),
        "per_point_std_median": float(np.median(per_point_std)),
        "per_point_std_p90": float(np.percentile(per_point_std, 90)),
        "implied_tilt_nats": float((per_point_std**2).mean() / 2.0),
    }
    print("probe noise:", out["probe_noise"], flush=True)

    # -- 2. dose-response of the logZ on probe count/dist ------------------
    arms = [
        ("gauss-1", dict(num_probes=1, probe_dist="gaussian")),
        ("gauss-4", dict(num_probes=4, probe_dist="gaussian")),
        ("gauss-16", dict(num_probes=16, probe_dist="gaussian")),
        ("rademacher-1", dict(num_probes=1, probe_dist="rademacher")),
    ]
    out["arms"] = {}
    for name, tkw in arms:
        transport = make_transport(
            run.apply_fn, divergence=cfg.divergence,
            n_steps=cfg.ode_steps, method=cfg.ode_method, **tkw,
        )
        rows = []
        for seed in range(args.seeds):
            t0 = time.time()
            r = run_flow_smc(
                target, cfg, transport, run.train.params, run.ref_dist,
                key=jax.random.PRNGKey(1000 + seed),
                n_particles=args.particles, n_steps=args.steps,
                num_mcmc_steps=args.mcmc_steps,
            )
            row = {
                "seed": seed, "lmbda": float(r.lmbda),
                "log_z": float(r.log_z),
                "ess_fraction": float(r.ess_fraction),
                "wall": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(name, row, flush=True)
        out["arms"][name] = {"transport": tkw, "rows": rows}

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
