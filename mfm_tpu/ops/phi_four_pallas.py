"""Pallas kernel for the phi^4 lattice log-likelihood (fused energy stencil).

The batched stencil in mfm_tpu.targets.phi_four (pad + first differences +
two row reductions) is already XLA-fusion-friendly; this kernel exists for
the highest-throughput regime — very large chain ensembles where keeping
the (tile, d) block resident in VMEM for ONE pass over the data (both the
on-site quartic and the coupling differences computed in-register, single
HBM read per element) removes the leftover intermediate traffic.

log p(x) = -beta * (U + V)
  V = sum_i (1 - x_i^2)^2 / (4 a d)
  U = (a d / 2) * sum boundary-aware first differences squared
    dirichlet: zero-padded ends; pbc: wrap-around difference
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _phi4_kernel(x_ref, out_ref, *, a: float, beta: float, dim: int, pbc: bool,
                 bc_value: float):
    x = x_ref[:]  # (tile, d)
    coef = a * dim
    # on-site potential, fully in-register
    diffs = 1.0 - x * x
    v = jnp.sum(diffs * diffs, axis=1) / (4.0 * coef)
    # coupling: interior differences. Column indices must be static
    # non-negative — a Python -1 becomes a dynamic_slice, which the Mosaic
    # TPU lowering rejects (interpret-mode tests never see this)
    d1 = x[:, 1:dim] - x[:, 0 : dim - 1]
    grad_sq = jnp.sum(d1 * d1, axis=1)
    if pbc:
        wrap = x[:, 0] - x[:, dim - 1]
        grad_sq = grad_sq + wrap * wrap
    else:  # dirichlet: boundary terms against the constant bc_value
        left = x[:, 0] - bc_value
        right = bc_value - x[:, dim - 1]
        grad_sq = grad_sq + left * left + right * right
    u = 0.5 * coef * grad_sq
    # broadcast the per-row scalar across the narrow lane dim (see
    # phi_four_log_lik: a flat (B,) output violates Mosaic's layout rules)
    out_ref[:] = jnp.broadcast_to(
        (-beta * (u + v))[:, None], (x.shape[0], out_ref.shape[1])
    )


@functools.partial(
    jax.jit, static_argnames=("a", "beta", "pbc", "bc_value", "tile", "interpret")
)
def phi_four_log_lik(
    x: jax.Array,
    a: float = 0.1,
    beta: float = 20.0,
    pbc: bool = False,
    bc_value: float = 0.0,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused phi^4 log-likelihood for a (B, d) field batch -> (B,)."""
    B, d = x.shape
    n_tiles = -(-B // tile)
    pad = n_tiles * tile - B
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))

    kernel = functools.partial(
        _phi4_kernel, a=a, beta=beta, dim=d, pbc=pbc, bc_value=bc_value
    )
    # per-row scalars ride a (B, 8) output whose block satisfies Mosaic's
    # (8, 128)-or-full-dim layout rule — a flat (B,) out_spec trips an
    # XLA-vs-Mosaic tiling mismatch on real hardware (T(1024) vs T(256))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, 8), jnp.float32),
        interpret=interpret or not _on_tpu(),
    )(xp)
    return out[:B, 0]
