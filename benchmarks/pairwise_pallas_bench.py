"""Settle the Pallas pairwise-metrics and phi^4-stencil claims (VERDICT r2
item 6): benchmark each fused kernel against its XLA twin at the benchmark
sizes, on the real chip, timing inside one jitted scan (per-call dispatch
over the tunnel is ~300 us, so eager timing measures the wire).

Surfaces and sizes:
- stein_disc vs ops.stein_disc_pallas      — T = 12800, d in {2, 64, 1600}
  (the reference eval size, exe_flow_matching.py:469-476)
- max_mean_disc vs ops.max_mean_disc_pallas — same T, d=2 (MMD only runs on
  the known-sampler 2-d targets)
- PhiFour.log_lik (jnp stencil) vs ops.phi_four_log_lik — (1024, 64), both
  boundary conditions (the MALA hot loop, distributions.py:131-151)

Writes one JSON with median us/call for each pair; the winner goes behind
config wiring (or the loser's docstring gets the negative result).
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_scanned(fn, args, iters=30, repeats=5):
    """Median seconds per call, timed inside one jitted lax.scan."""

    @jax.jit
    def run(*targs):
        def body(c, _):
            # perturb the input by the carry so the scan can't hoist the
            # call out of the loop as iteration-invariant
            shifted = tuple(
                t + c * 0.0 if hasattr(t, "dtype") else t for t in targs
            )
            out = fn(*shifted)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return c + s, None

        return jax.lax.scan(body, jnp.zeros(()), None, length=iters)[0]

    out = run(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(run(*args))
        times.append((time.time() - t0) / iters)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-size", type=int, default=12800)
    ap.add_argument("--out", default="RESULTS_raw_pairwise_pallas.json")
    args = ap.parse_args()

    from mfm_tpu.diagnostics import max_mean_disc, stein_disc
    from mfm_tpu.ops.pairwise_pallas import (
        max_mean_disc_pallas,
        stein_disc_pallas,
    )
    from mfm_tpu.ops.phi_four_pallas import phi_four_log_lik
    from mfm_tpu.targets import PhiFour

    results = {"device": str(jax.devices()[0]), "eval_size": args.eval_size}
    key = jax.random.PRNGKey(0)
    T = args.eval_size

    # ---- Stein disc: XLA GEMM-tiled vs fused Pallas --------------------------
    for d in (2, 64, 1600):
        X = jax.random.normal(jax.random.fold_in(key, d), (T, d))
        S = -X  # standard-normal score; cost is in the pairwise part
        score = lambda x: -x
        t_xla = time_scanned(lambda X: stein_disc(X, score), (X,))
        t_pl = time_scanned(lambda X: stein_disc_pallas(X, score), (X,))
        # parity check while we're here
        u0, v0 = jax.jit(lambda X: stein_disc(X, score))(X)
        u1, v1 = jax.jit(lambda X: stein_disc_pallas(X, score))(X)
        results[f"stein_T{T}_d{d}"] = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / t_pl, 3),
            # i.i.d.-normal U-stats sit at ~0, so absolute agreement (on
            # the same scale as the pairwise summands) is the right check
            "u_xla": float(u0), "u_pallas": float(u1),
            "abs_err_u": float(abs(u1 - u0)),
            "abs_err_v": float(abs(v1 - v0)),
        }
        print(f"stein d={d}:", results[f"stein_T{T}_d{d}"], flush=True)

    # ---- MMD -----------------------------------------------------------------
    X = jax.random.normal(jax.random.fold_in(key, 7), (T, 2))
    Y = jax.random.normal(jax.random.fold_in(key, 8), (T, 2))
    t_xla = time_scanned(lambda X, Y: max_mean_disc(X, Y), (X, Y))
    t_pl = time_scanned(lambda X, Y: max_mean_disc_pallas(X, Y), (X, Y))
    m0 = float(jax.jit(max_mean_disc)(X, Y))
    m1 = float(jax.jit(max_mean_disc_pallas)(X, Y))
    results[f"mmd_T{T}_d2"] = {
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "speedup": round(t_xla / t_pl, 3),
        "abs_err": abs(m1 - m0),
    }
    print("mmd:", results[f"mmd_T{T}_d2"], flush=True)

    # ---- phi^4 stencil: jnp pad/diff vs fused Pallas -------------------------
    for bc in ("dirichlet", "pbc"):
        tgt = PhiFour(64, bc=(bc, 0.0))
        xb = 0.5 * jax.random.normal(jax.random.fold_in(key, 9), (1024, 64))
        pl = lambda x: phi_four_log_lik(
            x, a=tgt.a, beta=tgt.beta, pbc=(bc == "pbc")
        )
        t_jnp = time_scanned(lambda x: tgt.log_lik(x), (xb,))
        t_pl = time_scanned(pl, (xb,))
        l0 = jax.jit(tgt.log_lik)(xb)
        l1 = jax.jit(pl)(xb)
        results[f"phi4_{bc}_1024x64"] = {
            "jnp_us": round(t_jnp * 1e6, 2),
            "pallas_us": round(t_pl * 1e6, 2),
            "speedup": round(t_jnp / t_pl, 3),
            "max_abs_err": float(jnp.max(jnp.abs(l1 - l0))),
        }
        print(f"phi4 {bc}:", results[f"phi4_{bc}_1024x64"], flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
