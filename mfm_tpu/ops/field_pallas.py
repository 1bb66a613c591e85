"""Weight-resident fused Pallas apply for the CNF vector field.

Reference hot loop: every ODE stage evaluates VectorFieldNet
(/root/reference/exe_flow_matching.py:66-90,208-220) — Fourier time
features, three MLP trunks, two heads — and the divergence path re-reads
every weight a second time for the JVP. For mid-size fields (phi-four:
d=64, 128-wide trunks, ~0.5 MB of weights) the whole parameter set fits in
VMEM, so one Pallas kernel can:

- keep ALL weights resident on-chip for the whole batch tile (XLA streams
  them per-matmul),
- eliminate the two lane-concatenations (time features [cos|sin] and the
  joint [x-trunk|t-trunk] input) by splitting the first-layer weight
  matrices: concat(a, b) @ W == a @ W_top + b @ W_bottom,
- fuse the primal AND the x-tangent pass (for Hutchinson / exact-trace
  divergence) into one kernel, reading each weight once for both.

The public wrapper is a drop-in ``apply(params, x, t)`` with a custom JVP:
x-tangents run the fused kernel; any weight/time tangent (training-time
grads) falls back to jax.jvp of the pure-jnp reference implementation, so
correctness never depends on the kernel's derivative coverage. The score
gate stays OUTSIDE the kernel (target-specific), composing as
``field + gate * score(x)`` exactly like flows.vector_field.

Weights >> VMEM (pines: 1024-wide, ~52 MB) keep using the XLA path — that
regime is HBM-streaming-bound and was measured in round 1 to gain nothing
from fusion (ROADMAP item 2); ``fits_in_vmem`` guards the dispatch.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "relu": (lambda z: jnp.maximum(z, 0.0), lambda z: (z > 0.0).astype(z.dtype)),
    "tanh": (jnp.tanh, lambda z: 1.0 - jnp.tanh(z) ** 2),
}


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"

TILE_B = 256
VMEM_WEIGHT_BUDGET = 8 * 1024 * 1024  # leave headroom of the ~16 MB VMEM


def _trunk_params(params: dict, name: str):
    layers = params["params"][name]
    out = []
    for i in range(len(layers)):
        d = layers[f"Dense_{i}"]
        out.append((d["kernel"], d["bias"]))
    return out


def split_params(params: dict):
    """Flatten the flax param tree into the kernel's fixed argument order,
    splitting the two concat-consuming first layers."""
    t_trunk = _trunk_params(params, "t_trunk")
    x_trunk = _trunk_params(params, "x_trunk")
    xt_trunk = _trunk_params(params, "xt_trunk")
    gate_k = params["params"]["gate_head"]["kernel"]
    gate_b = params["params"]["gate_head"]["bias"]
    field_k = params["params"]["field_head"]["kernel"]
    field_b = params["params"]["field_head"]["bias"]

    flat = []
    (w0, b0), *t_rest = t_trunk
    f = w0.shape[0] // 2
    flat += [w0[:f], w0[f:], b0[None]]  # cos/sin split
    for w, b in t_rest:
        flat += [w, b[None]]
    for w, b in x_trunk:
        flat += [w, b[None]]
    (wj, bj), *xt_rest = xt_trunk
    hx = x_trunk[-1][0].shape[1]
    flat += [wj[:hx], wj[hx:], bj[None]]  # x-trunk/t-trunk split
    for w, b in xt_rest:
        flat += [w, b[None]]
    flat += [gate_k, gate_b[None], field_k, field_b[None]]
    meta = (len(t_rest), len(x_trunk), len(xt_rest))
    return tuple(flat), meta


def fits_in_vmem(params: dict) -> bool:
    leaves = jax.tree_util.tree_leaves(params)
    nbytes = sum(math.prod(l.shape) * l.dtype.itemsize for l in leaves)
    return nbytes <= VMEM_WEIGHT_BUDGET


def _forward(refs, meta, act, with_tangent: bool):
    """Shared kernel body. refs = [x, t, (ex,)] + weights + outputs."""
    n_t_rest, n_x, n_xt_rest = meta
    a, da = act

    it = iter(refs)
    x_ref = next(it)
    t_ref = next(it)
    ex_ref = next(it) if with_tangent else None
    freqs_ref = next(it)

    def take():
        return next(it)

    x = x_ref[:]
    t = t_ref[:]  # (TILE_B, 1)
    ex = ex_ref[:] if with_tangent else None

    # Fourier features (VPU): ang (TILE_B, F)
    ang = (2.0 * jnp.pi) * t * freqs_ref[:]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    # t-trunk, first layer via the split weights (no lane concat)
    wc, ws, b = take()[:], take()[:], take()[:]
    h_t = a(
        jnp.dot(cos, wc, preferred_element_type=jnp.float32)
        + jnp.dot(sin, ws, preferred_element_type=jnp.float32)
        + b
    )
    for _ in range(n_t_rest):
        w, b = take()[:], take()[:]
        h_t = a(jnp.dot(h_t, w, preferred_element_type=jnp.float32) + b)

    # x-trunk (+ tangent chained through the same weights)
    h_x, dh_x = x, ex
    for _ in range(n_x):
        w, b = take()[:], take()[:]
        z = jnp.dot(h_x, w, preferred_element_type=jnp.float32) + b
        if with_tangent:
            dh_x = da(z) * jnp.dot(dh_x, w, preferred_element_type=jnp.float32)
        h_x = a(z)

    # joint trunk, first layer via split weights
    wx, wt, b = take()[:], take()[:], take()[:]
    z = (
        jnp.dot(h_x, wx, preferred_element_type=jnp.float32)
        + jnp.dot(h_t, wt, preferred_element_type=jnp.float32)
        + b
    )
    if with_tangent:
        dh = da(z) * jnp.dot(dh_x, wx, preferred_element_type=jnp.float32)
    h = a(z)
    for _ in range(n_xt_rest):
        w, b = take()[:], take()[:]
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if with_tangent:
            dh = da(z) * jnp.dot(dh, w, preferred_element_type=jnp.float32)
        h = a(z)

    wg, bg = take()[:], take()[:]
    gate = jnp.dot(h_t, wg, preferred_element_type=jnp.float32) + bg
    wf, bf = take()[:], take()[:]
    field = jnp.dot(h, wf, preferred_element_type=jnp.float32) + bf
    if with_tangent:
        dfield = jnp.dot(dh, wf, preferred_element_type=jnp.float32)
        return field, gate, dfield
    return field, gate


def _make_kernel(meta, act_name: str, with_tangent: bool):
    act = _ACTS[act_name]

    def kernel(*refs):
        n_out = 3 if with_tangent else 2
        ins, outs = refs[:-n_out], refs[-n_out:]
        results = _forward(ins, meta, act, with_tangent)
        for ref, val in zip(outs, results):
            ref[:] = val

    return kernel


def _pallas_apply(flat_weights, meta, act_name, freqs, x, t, ex=None):
    """Dispatch the fused kernel over batch tiles. x (B, d), t (B,),
    ex optional (B, d) x-tangent. Returns (field, gate[, dfield])."""
    b, dim = x.shape
    with_tangent = ex is not None
    pad = (-b) % TILE_B
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        t = jnp.pad(t, (0, pad))
        if with_tangent:
            ex = jnp.pad(ex, ((0, pad), (0, 0)))
    bp = x.shape[0]
    grid = (bp // TILE_B,)

    batch_spec = pl.BlockSpec(
        (TILE_B, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    t_spec = pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    inputs = [x, t[:, None]]
    in_specs = [batch_spec, t_spec]
    if with_tangent:
        inputs.append(ex)
        in_specs.append(batch_spec)
    inputs.append(freqs[None, :])
    in_specs.append(full(freqs[None, :]))
    for wgt in flat_weights:
        inputs.append(wgt)
        in_specs.append(full(wgt))

    n_out = 3 if with_tangent else 2
    out_shape = [jax.ShapeDtypeStruct((bp, dim), jnp.float32)] * n_out
    out_specs = [batch_spec] * n_out

    out = pl.pallas_call(
        _make_kernel(meta, act_name, with_tangent),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=not _on_tpu(),
    )(*inputs)
    if pad:
        out = tuple(o[:b] for o in out)
    return tuple(out)


def _reference_apply(flat_weights, meta, act_name, fourier_freqs, x, t):
    """Pure-jnp twin of the kernel (same split-weight algebra). Used for
    parity tests and as the autodiff fallback for weight/time tangents."""
    n_t_rest, n_x, n_xt_rest = meta
    a = _ACTS[act_name][0]
    it = iter(flat_weights)

    def take():
        return next(it)

    ang = (2.0 * jnp.pi) * t[:, None] * fourier_freqs[None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    wc, ws, b = take(), take(), take()
    h_t = a(cos @ wc + sin @ ws + b)
    for _ in range(n_t_rest):
        w, b = take(), take()
        h_t = a(h_t @ w + b)
    h_x = x
    for _ in range(n_x):
        w, b = take(), take()
        h_x = a(h_x @ w + b)
    wx, wt, b = take(), take(), take()
    h = a(h_x @ wx + h_t @ wt + b)
    for _ in range(n_xt_rest):
        w, b = take(), take()
        h = a(h @ w + b)
    wg, bg = take(), take()
    gate = h_t @ wg + bg
    wf, bf = take(), take()
    field = h @ wf + bf
    return field, gate


def make_pallas_field_apply(
    params_template: dict,
    fourier_freqs: jax.Array,
    act_name: str = "relu",
    score_fn: Optional[Callable] = None,
    score_clip: Optional[float] = None,
) -> Callable:
    """Build ``apply(params, x, t) -> field`` running the fused kernel.

    Drop-in for ``VectorFieldNet.apply`` in the CNF transport: batch-first,
    score gate composed outside the kernel, differentiable — x-tangents
    (divergence estimators) take the fused primal+tangent kernel, anything
    else falls back to autodiff of the jnp twin.
    """
    if act_name not in _ACTS:
        raise ValueError(
            f"pallas field supports activations {sorted(_ACTS)}, got {act_name!r}"
        )
    _, meta = split_params(params_template)
    freqs = jnp.asarray(fourier_freqs)

    _SymZero = jax.custom_derivatives.SymbolicZero

    def _is_zero(tan):
        return all(
            isinstance(l, _SymZero)
            for l in jax.tree_util.tree_leaves(
                tan, is_leaf=lambda n: isinstance(n, _SymZero)
            )
        )

    def _materialize(prim, tan):
        return jax.tree_util.tree_map(
            lambda p, tl: jnp.zeros_like(p) if isinstance(tl, _SymZero) else tl,
            prim,
            tan,
            is_leaf=lambda n: isinstance(n, _SymZero),
        )

    @jax.custom_jvp
    def mlp(params, x, t):
        flat, _ = split_params(params)
        return _pallas_apply(flat, meta, act_name, freqs, x, t)

    def mlp_jvp(primals, tangents):
        params, x, t = primals
        dparams, dx, dt = tangents

        if _is_zero(dparams) and _is_zero(dt) and not _is_zero(dx):
            # divergence-estimator path: fused primal+tangent kernel
            flat, _ = split_params(params)
            field, gate, dfield = _pallas_apply(
                flat, meta, act_name, freqs, x, t, ex=dx
            )
            dgate = jnp.zeros_like(gate)  # gate depends only on t
            return (field, gate), (dfield, dgate)

        # general tangents (training-time weight grads): jnp twin autodiff
        def ref(p, xx, tt):
            fl, _ = split_params(p)
            return _reference_apply(fl, meta, act_name, freqs, xx, tt)

        return jax.jvp(
            ref,
            (params, x, t),
            (
                _materialize(params, dparams),
                _materialize(x, dx),
                _materialize(t, dt),
            ),
        )

    mlp.defjvp(mlp_jvp, symbolic_zeros=True)

    def apply(params, x, t):
        single = x.ndim == 1
        if single:
            x = x[None, :]
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype).reshape(-1), (x.shape[0],))
        field, gate = mlp(params, x, t)
        if score_fn is not None:
            score = score_fn(x)
            if score_clip is not None:
                score = jnp.clip(score, -score_clip, score_clip)
            field = field + gate * score
        return field[0] if single else field

    return apply
