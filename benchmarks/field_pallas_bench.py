"""Microbenchmark: fused weight-resident Pallas field apply vs XLA.

VERDICT r1 item 9: phi-four-sized trunks (d=64, 128-wide, weights << VMEM).
Measures the plain apply (one ODE stage) and the Hutchinson JVP pair (the
divergence path reads every weight twice under XLA; the fused kernel reads
each once). Records the result to RESULTS_raw_field_pallas.json.

Usage: python benchmarks/field_pallas_bench.py [--batch 1024] [--width 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scanned(apply_like, params, x, t, extra=None, n=2000):
    """Time n applications inside ONE jitted scan (dispatch amortized —
    per-call host-loop timing over the remote TPU tunnel measures dispatch
    latency, not the kernel). The carry feeds each output back in so stages
    cannot be folded away."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x0):
        def body(x, _):
            out = apply_like(params, x, t) if extra is None else apply_like(
                params, x, t, extra
            )
            return x + 1e-6 * out, None

        return lax.scan(body, x0, None, length=n)[0]

    out = run(x)
    jax.block_until_ready(out)
    start = time.time()
    out = run(x)
    jax.block_until_ready(out)
    return (time.time() - start) / n * 1e6  # us per application


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--fourier", type=int, default=128)
    p.add_argument("--out", default="RESULTS_raw_field_pallas.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mfm_tpu.flows.vector_field import NON_LINEARITIES, VectorFieldNet
    from mfm_tpu.ops.field_pallas import fits_in_vmem, make_pallas_field_apply
    from mfm_tpu.targets import PhiFour

    target = PhiFour(args.dim)
    key = jax.random.PRNGKey(0)
    kf, ki = jax.random.split(key)
    freqs = jax.random.normal(kf, (args.fourier,))
    w = (args.width, args.width)
    net = VectorFieldNet(
        fourier_freqs=freqs, hidden_x=w, hidden_t=w, hidden_xt=w,
        act=NON_LINEARITIES["relu"], score_fn=target.score,
        precision=jax.lax.Precision.HIGHEST,
    )
    params = net.init(ki, jnp.zeros((1, args.dim)), jnp.zeros((1,)))
    assert fits_in_vmem(params)
    apply_pl = make_pallas_field_apply(params, freqs, "relu", score_fn=target.score)

    x = jax.random.normal(jax.random.fold_in(key, 2), (args.batch, args.dim))
    t = jnp.full((args.batch,), 0.37)
    eps = jax.random.normal(jax.random.fold_in(key, 3), x.shape)

    # parity first
    d = float(
        jnp.abs(
            jax.jit(net.apply)(params, x, t) - jax.jit(apply_pl)(params, x, t)
        ).max()
    )

    def jvp_xla(p, xx, tt, e):
        return jax.jvp(lambda u: net.apply(p, u, tt), (xx,), (e,))[1]

    def jvp_pl(p, xx, tt, e):
        return jax.jvp(lambda u: apply_pl(p, u, tt), (xx,), (e,))[1]

    dj = float(
        jnp.abs(
            jax.jit(jvp_xla)(params, x, t, eps) - jax.jit(jvp_pl)(params, x, t, eps)
        ).max()
    )

    res = {
        "batch": args.batch, "dim": args.dim, "width": args.width,
        "device": str(jax.devices()[0]),
        "primal_max_abs_diff": d,
        "jvp_max_abs_diff": dj,
        "apply_us_xla": bench_scanned(net.apply, params, x, t),
        "apply_us_pallas": bench_scanned(apply_pl, params, x, t),
        "jvp_us_xla": bench_scanned(jvp_xla, params, x, t, extra=eps),
        "jvp_us_pallas": bench_scanned(jvp_pl, params, x, t, extra=eps),
    }
    res["apply_speedup"] = res["apply_us_xla"] / res["apply_us_pallas"]
    res["jvp_speedup"] = res["jvp_us_xla"] / res["jvp_us_pallas"]
    print(json.dumps(res, indent=2))
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
