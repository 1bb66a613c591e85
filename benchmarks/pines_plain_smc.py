"""Pines d=1600: plain (no-flow) adaptive tempered SMC logZ cross-validation.

ROADMAP item 1 residual: plain SMC with in-loop step adaptation reads
501.5 +/- 0.6 nats vs flow-annealed SMC's 503.6 +/- 0.3, with the ~2-nat
gap in the direction of plain SMC's downward bias under imperfect mixing.
This experiment measures whether a better move stage closes it:

- ``standard``: the round-3 baseline (1024 particles, adaptive MALA step,
  alpha=0.9, 10 inner moves per temperature) — replicates the 501.5 row.
- ``waste-free``: Dau & Chopin 2022 via cfg.waste_free_p at a *matched
  move budget*: N = 11264 particles, P = 11 -> M = 1024 resampled
  ancestors x 10 moves each = the standard arm's 10240 move-evals per
  temperature, but an 11x larger particle system (every intermediate
  chain state kept as a support point).
- ``nuts``: standard particle count, self-tuning NUTS inner moves
  (cfg.mcmc_kernel='nuts', in-loop dual averaging + particle-variance
  mass) — deeper moves per temperature at higher cost per move.

Each arm reports final lambda, logZ, and wall-clock per seed.
Reference anchor: exe_others.py:79-111 (fixed-step MALA SMC only).

Usage: python benchmarks/pines_plain_smc.py [--seeds 3] [--arms standard,waste-free,nuts]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ARMS = {
    # name -> cfg overrides on top of the shared pines SMC budget
    "standard": dict(num_chain=1024),
    # 11264 = 1024 ancestors x 11 states; (P-1)*M = 10240 move-evals/temp
    # matches standard's 10 x 1024 — but kept states average only (P-1)/2
    # mixing moves since their resample
    "waste-free": dict(num_chain=11264, waste_free_p=11),
    # same move budget, longer chains: fewer ancestors mixing further
    "waste-free-p21": dict(num_chain=10752, waste_free_p=21),   # 512 x 20
    "waste-free-p41": dict(num_chain=10496, waste_free_p=41),   # 256 x 40
    # NUTS costs ~2^depth grad-evals per move; 2 moves/temp keeps the
    # budget within ~2x of the MALA arms at adapted depth ~3-4
    "nuts": dict(num_chain=1024, mcmc_kernel="nuts",
                 anneal_iter=200, num_anneal_temp=100),  # 2 inner moves/temp
    # deeper NUTS mixing per temperature
    "nuts-5": dict(num_chain=1024, mcmc_kernel="nuts",
                   anneal_iter=200, num_anneal_temp=40),  # 5 inner moves/temp
    # waste-free over NUTS chains: every well-mixed intermediate state
    # becomes a support point (6144 = 1024 ancestors x 6 states)
    "nuts-wf": dict(num_chain=6144, waste_free_p=6, mcmc_kernel="nuts"),
    # finite-N bias probe: the NUTS arms plateau at 501.8 independent of
    # move budget, so scale the particle count instead
    "nuts-n4096": dict(num_chain=4096, mcmc_kernel="nuts",
                       anneal_iter=200, num_anneal_temp=100),
    "nuts-n8192": dict(num_chain=8192, mcmc_kernel="nuts",
                       anneal_iter=200, num_anneal_temp=100),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--arms", default="standard,waste-free,nuts")
    ap.add_argument("--learning-iter", type=int, default=150,
                    help="cap on adaptive temperature steps")
    ap.add_argument("--out", default="RESULTS_raw_pines_plain_smc.json")
    args = ap.parse_args()

    from mfm_tpu.cli import make_target
    from mfm_tpu.config import preset
    from mfm_tpu.drivers.smc_run import run_smc

    target = make_target("pines")
    out = {"arms": {}}
    for arm in args.arms.split(","):
        overrides = ARMS[arm]
        rows = []
        for seed in range(args.seeds):
            base = dict(
                seed=seed, learning_iter=args.learning_iter,
                eval_iter=1, alpha=0.9, step_size=0.02,
                adapt_step_size=True,
                # 10 inner moves per temperature unless the arm overrides
                anneal_iter=200, num_anneal_temp=20,
            )
            cfg = preset("pines", **{**base, **overrides})
            t0 = time.time()
            r = run_smc(target, cfg)
            row = {
                "seed": seed, "lmbda": float(r.lmbda),
                "log_z": float(r.log_z),
                "smc_time": round(r.train_time, 1),
                "wall": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(arm, row, flush=True)
        out["arms"][arm] = {"config": overrides, "rows": rows}

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
