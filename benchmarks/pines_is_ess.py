"""Pines (LGCP, d=1600) IS-ESS study: eval-time divergence probes.

Hypothesis (VERDICT r1 item 8 / ROADMAP 1): the flow's importance weights
w = pi(x)/q(x) exponentiate the Hutchinson logdet noise — under a lognormal
error of std sigma the ESS fraction decays like exp(-sigma^2), so at d=1600
the single-probe estimator (reference parity, exe_flow_matching.py:211-214)
can single-handedly collapse the IS-ESS even when the transport itself is
good. Eval-time multi-probe / Rademacher estimators attack exactly that
term at unchanged TRAINING cost.

Usage: python benchmarks/pines_is_ess.py [--learning-iter N] [--out FILE]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ess_fraction(log_w):
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    n = log_w.shape[0]
    return float(jnp.exp(2 * logsumexp(log_w) - logsumexp(2 * log_w))) / n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--learning-iter", type=int, default=10_000)
    p.add_argument("--n-eval", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="RESULTS_raw_pines_ess.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mfm_tpu.config import preset
    from mfm_tpu.drivers import run_mfm
    from mfm_tpu.drivers.mfm import sample_flow_parts
    from mfm_tpu.flows import make_transport
    from mfm_tpu.targets import LogGaussianCoxPines

    target = LogGaussianCoxPines(1600)
    cfg = preset(
        "pines", learning_iter=args.learning_iter, chunk_size=1000,
        seed=args.seed,
    )
    run = run_mfm(target, cfg)
    print(f"trained: {run.train_time:.1f}s", flush=True)

    variants = [
        ("gauss_k1_s24", dict(num_probes=1, probe_dist="gaussian"), 24),
        ("gauss_k8_s24", dict(num_probes=8, probe_dist="gaussian"), 24),
        ("rad_k8_s24", dict(num_probes=8, probe_dist="rademacher"), 24),
        ("rad_k32_s24", dict(num_probes=32, probe_dist="rademacher"), 24),
        ("rad_k8_s48", dict(num_probes=8, probe_dist="rademacher"), 48),
    ]
    results = {"train_time": run.train_time, "learning_iter": args.learning_iter}
    key = jax.random.PRNGKey(args.seed + 999)
    for name, probes, steps in variants:
        transport = make_transport(
            run.apply_fn, divergence="hutchinson", n_steps=steps,
            method=cfg.ode_method, **probes,
        )
        import time

        start = time.time()
        flow_s, exact_s, log_w = sample_flow_parts(
            transport, run.train.params, run.ref_dist, key, args.n_eval, target
        )
        jax.block_until_ready(log_w)
        eval_time = time.time() - start
        results[name] = {
            "is_ess_frac": ess_fraction(log_w),
            "logpdf": float(jnp.mean(target.log_prob(flow_s))),
            "logpdf_star": float(jnp.mean(target.log_prob(exact_s))),
            "log_w_std": float(jnp.std(log_w - jnp.max(log_w))),
            "eval_time_s": eval_time,
        }
        print(name, json.dumps(results[name]), flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
