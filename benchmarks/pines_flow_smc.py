"""Pines d=1600: flow-annealed SMC vs the raw IS correction.

The VERDICT r2 headline question: can the trained pines flow become a
*usable weighted sampler*? Raw self-normalized IS is structurally
degenerate here (log-weight spread ~12 nats, ESS a handful of samples —
benchmarks/pines_is_ess.py, same for the reference). This experiment
anneals q0 -> pi with adaptive tempered SMC in the flow's latent space
(drivers/flow_smc.py) and records, per seed:

- final lambda (1.0 = annealing reached the target)
- log-normalizer estimate (stability across seeds = usability signal)
- per-increment ESS (by construction >= alpha*N while lambda < 1)
- raw-IS ESS fraction on the same flow, same particle count (baseline)
- KSD-U of the annealed ensemble vs the IS-resampled ensemble
- wall-clock vs the training run's

Usage: python benchmarks/pines_flow_smc.py [--seeds 3] [--particles 1024]
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
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--particles", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--mcmc-steps", type=int, default=5)
    ap.add_argument("--learning-iter", type=int, default=10_000)
    ap.add_argument("--inner", default=None,
                    help="inner kernel: mala|hmc|nuts|tess (default cfg.mcmc_kernel)")
    ap.add_argument("--alpha", type=float, default=None,
                    help="adaptive-tempering ESS target (default: preset 0.95; "
                         "0.8 takes ~3x bigger lambda increments)")
    ap.add_argument("--out", default="RESULTS_raw_pines_flow_smc.json")
    args = ap.parse_args()

    from mfm_tpu.cli import make_target
    from mfm_tpu.config import preset
    from mfm_tpu.diagnostics import stein_disc
    from mfm_tpu.drivers.flow_smc import run_flow_smc
    from mfm_tpu.drivers.mfm import run_mfm, sample_flow

    cfg = preset(
        "pines",
        learning_iter=args.learning_iter,
        mcmc_per_flow_steps=100.0,
        # latent-space MALA needs a tuned step; let dual averaging find it
        adapt_step_size=True,
    )
    if args.alpha is not None:
        cfg.alpha = args.alpha
    target = make_target("pines")

    t0 = time.time()
    run = run_mfm(target, cfg)
    train_time = run.train_time
    print(f"trained: {train_time:.1f}s ({time.time()-t0:.1f}s wall)", flush=True)

    out = {
        "config": {
            "particles": args.particles, "steps": args.steps,
            "mcmc_steps": args.mcmc_steps, "learning_iter": args.learning_iter,
            "alpha": cfg.alpha, "inner": args.inner,
        },
        "train_time": train_time,
        "seeds": [],
    }

    # baseline: raw-IS ESS + KSD of the IS-resampled ensemble (once)
    key_is = jax.random.PRNGKey(4242)
    flow_s, exact_s, log_w = sample_flow(run, key_is, args.particles, target)
    lw = np.asarray(log_w, np.float64)
    lw -= lw.max()
    w = np.exp(lw) / np.exp(lw).sum()
    ess_is = float(1.0 / (w**2).sum() / len(w))
    ksd_is = stein_disc(exact_s, target.score)
    out["raw_is"] = {
        "ess_fraction": ess_is,
        "ksd_u": float(ksd_is[0]),
        "ksd_v": float(ksd_is[1]),
        "logpdf": float(jnp.mean(target.log_prob(exact_s))),
    }
    print("raw IS:", out["raw_is"], flush=True)

    for seed in range(args.seeds):
        t1 = time.time()
        r = run_flow_smc(
            target, cfg, run.transport, run.train.params, run.ref_dist,
            key=jax.random.PRNGKey(1000 + seed), n_particles=args.particles,
            n_steps=args.steps, num_mcmc_steps=args.mcmc_steps,
            inner_kernel=args.inner, steady_timing=True,
        )
        # KSD of the annealed ensemble (resampled by final weights)
        idx = jax.random.categorical(
            jax.random.PRNGKey(seed), jnp.log(r.weights), shape=(args.particles,)
        )
        picked = r.samples[idx]
        ksd = stein_disc(picked, target.score)
        row = {
            "seed": seed,
            "lmbda": float(r.lmbda),
            "log_z": float(r.log_z),
            "ess_fraction": float(r.ess_fraction),
            "ksd_u": float(ksd[0]),
            "ksd_v": float(ksd[1]),
            "logpdf": float(jnp.mean(target.log_prob(picked))),
            "smc_time": r.train_time,
            "wall": time.time() - t1,
            "acceptance_tail": [float(a) for a in np.asarray(r.acceptance)[-5:]],
        }
        out["seeds"].append(row)
        print(row, flush=True)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
