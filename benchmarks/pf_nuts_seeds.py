"""Phi-four 5-seed NUTS-vs-MALA replication (VERDICT r2 item 7).

Round 2 measured untuned NUTS beating hand-tuned MALA on the mean but with
2.5x the seed variance (flow KSD-U 1.93 +/- 1.60 vs 2.45 +/- 0.64), traced
to in-loop adaptation running through the END of training: the final
chunk's chain quality rides on the last mass re-anchor. Round-3 fix:
``adapt_freeze_fraction`` freezes step (at the dual-averaged value) and
mass after 60% of the run. This script replicates the exact r2 protocol
(5 seeds i^10, phi-four d=64, 1024 chains, 10k iters, mcmc/flow=100) for
both kernels and a chosen freeze fraction.

Usage: python benchmarks/pf_nuts_seeds.py [--freeze 0.6] [--kernels nuts]
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
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--freeze", type=float, default=0.6)
    ap.add_argument("--kernels", nargs="+", default=["nuts", "mala"])
    ap.add_argument("--learning-iter", type=int, default=10_000)
    ap.add_argument("--out", default="RESULTS_raw_pf_nuts_seeds_r3.json")
    args = ap.parse_args()

    from mfm_tpu.cli import make_target
    from mfm_tpu.config import preset
    from mfm_tpu.diagnostics import stein_disc
    from mfm_tpu.drivers.mfm import run_mfm, sample_flow

    target = make_target("phi-four")
    out = {"freeze": args.freeze, "rows": {}}

    for kernel in args.kernels:
        rows = []
        for i in range(args.seeds):
            seed = i**10
            cfg = preset(
                "phi-four",
                seed=seed,
                learning_iter=args.learning_iter,
                mcmc_per_flow_steps=100.0,
                mcmc_kernel=kernel,
                adapt_freeze_fraction=args.freeze,
            )
            run = run_mfm(target, cfg)
            n_eval = cfg.eval_iter * cfg.num_chain
            flow_s, exact_s, _ = sample_flow(
                run, jax.random.PRNGKey(seed + 1), n_eval, target
            )
            u, v = stein_disc(flow_s, target.score)
            row = [
                float(u),
                float(jnp.mean(target.log_prob(exact_s))),
                run.train_time,
            ]
            rows.append(row)
            print(kernel, seed, row, flush=True)
        arr = np.asarray(rows)
        out["rows"][kernel] = rows
        out[kernel] = {
            "ksd_u_mean": round(float(arr[:, 0].mean()), 3),
            "ksd_u_ci": round(float(1.96 * arr[:, 0].std()), 3),
            "logpdf_star_mean": round(float(arr[:, 1].mean()), 2),
            "train_mean": round(float(arr[:, 2].mean()), 2),
        }
        print(kernel, out[kernel], flush=True)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
