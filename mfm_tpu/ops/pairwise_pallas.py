"""Pallas TPU kernels for the O(T^2) pairwise metric reductions.

The diagnostics layer (mfm_tpu.diagnostics.metrics) already formulates
Stein/MMD as tiled GEMMs; these kernels fuse the whole per-tile pipeline —
the MXU dots, the row-norm/row-dot vectors (computed in-register from the
tiles), the IMQ/RBF elementwise math, and the tile reduction — into one
VMEM-resident pass per (row-tile, col-tile) grid cell, so no (tile, T)
intermediate ever round-trips through HBM. Grid cells accumulate into a
single SMEM scalar; TPU grids execute sequentially per core, making the
read-modify-write safe (pallas_guide.md, Grid section).

On non-TPU backends the kernels run in interpreter mode (tests compare them
against the pure-JAX implementations at f32 tolerance).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pad_to(x, rows):
    pad = rows - x.shape[0]
    if pad > 0:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _stein_tile_kernel(
    t_ref, xi_ref, si_ref, xj_ref, sj_ref, out_ref, *, tile: int, d: int, b: float
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    T = t_ref[0]
    xi = xi_ref[:]  # (tile, d)
    si = si_ref[:]
    xj = xj_ref[:]
    sj = sj_ref[:]

    sqi = jnp.sum(xi * xi, axis=1)  # (tile,)
    sqj = jnp.sum(xj * xj, axis=1)
    sxxi = jnp.sum(si * xi, axis=1)
    sxxj = jnp.sum(sj * xj, axis=1)

    xy = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32)
    sxy = jnp.dot(si, xj.T, preferred_element_type=jnp.float32)
    syx = jnp.dot(xi, sj.T, preferred_element_type=jnp.float32)
    ss = jnp.dot(si, sj.T, preferred_element_type=jnp.float32)

    r = jnp.maximum(sqi[:, None] + sqj[None, :] - 2.0 * xy, 0.0)
    base = 1.0 + r
    cross = sxxi[:, None] - sxy - syx + sxxj[None, :]
    term = (
        -4.0 * b * (b + 1.0) * r / base ** (b + 2.0)
        + 2.0 * b * (d + cross) / base ** (b + 1.0)
        + ss / base**b
    )
    rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, term.shape, 0)
    cols = j * tile + jax.lax.broadcasted_iota(jnp.int32, term.shape, 1)
    term = jnp.where((rows < T) & (cols < T), term, 0.0)
    out_ref[0, 0] += jnp.sum(term)


@functools.partial(jax.jit, static_argnames=("beta", "tile", "interpret"))
def stein_pairwise_sum(
    X: jax.Array,
    S: jax.Array,
    beta: float = -0.5,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Total IMQ-Stein pairwise sum (including the diagonal) over all (i, j).

    Combine with the closed-form diagonal to get U/V statistics (see
    mfm_tpu.diagnostics.metrics.stein_disc for the formulation and the
    reference parity notes)."""
    T, d = X.shape
    n_tiles = -(-T // tile)
    rows = n_tiles * tile
    Xp = _pad_to(X.astype(jnp.float32), rows)
    Sp = _pad_to(S.astype(jnp.float32), rows)
    t_arr = jnp.asarray([T], jnp.int32)

    kernel = functools.partial(_stein_tile_kernel, tile=tile, d=d, b=float(-beta))
    row_spec = pl.BlockSpec((tile, d), lambda i, j: (i, 0))
    col_spec = pl.BlockSpec((tile, d), lambda i, j: (j, 0))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec, row_spec, col_spec, col_spec,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret or not _on_tpu(),
    )(t_arr, Xp, Sp, Xp, Sp)
    return out[0, 0]


def _mmd_tile_kernel(t_ref, ai_ref, bj_ref, out_ref, *, tile: int, inv2s2: float):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    Ta = t_ref[0]
    Tb = t_ref[1]
    ai = ai_ref[:]
    bj = bj_ref[:]
    sqa = jnp.sum(ai * ai, axis=1)
    sqb = jnp.sum(bj * bj, axis=1)
    ab = jnp.dot(ai, bj.T, preferred_element_type=jnp.float32)
    r = jnp.maximum(sqa[:, None] + sqb[None, :] - 2.0 * ab, 0.0)
    k = jnp.exp(-r * inv2s2)
    rows = i * tile + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    cols = j * tile + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    k = jnp.where((rows < Ta) & (cols < Tb), k, 0.0)
    out_ref[0, 0] += jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("sigma2", "tile", "interpret"))
def rbf_kernel_sum(
    A: jax.Array,
    B: jax.Array,
    sigma2: float = 1.0,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """sum_ij exp(-||a_i - b_j||^2 / (2 sigma2)) over all pairs."""
    d = A.shape[1]
    na = -(-A.shape[0] // tile)
    nb = -(-B.shape[0] // tile)
    Ap = _pad_to(A.astype(jnp.float32), na * tile)
    Bp = _pad_to(B.astype(jnp.float32), nb * tile)
    t_arr = jnp.asarray([A.shape[0], B.shape[0]], jnp.int32)

    kernel = functools.partial(_mmd_tile_kernel, tile=tile, inv2s2=0.5 / sigma2)
    out = pl.pallas_call(
        kernel,
        grid=(na, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret or not _on_tpu(),
    )(t_arr, Ap, Bp)
    return out[0, 0]


def stein_disc_pallas(X: jax.Array, score_fn, beta: float = -0.5, tile: int = 256):
    """Drop-in for diagnostics.stein_disc using the fused kernel."""
    T, d = X.shape
    S = score_fn(X)
    total = stein_pairwise_sum(X, S, beta=beta, tile=tile)
    b = -beta
    diag = jnp.sum(2.0 * b * d + jnp.sum(S * S, axis=-1))
    return (total - diag) / (T * (T - 1)), total / (T * T)


def max_mean_disc_pallas(X: jax.Array, Y: jax.Array, sigma2: float = 1.0, tile: int = 256):
    """Drop-in for diagnostics.max_mean_disc using the fused kernel."""
    m = X.shape[0]
    xx = rbf_kernel_sum(X, X, sigma2, tile) - m
    yy = rbf_kernel_sum(Y, Y, sigma2, tile) - Y.shape[0]
    xy = rbf_kernel_sum(X, Y, sigma2, tile)
    m2 = m * m
    return xx / (m2 - m) - 2.0 * xy / m2 + yy / (m2 - m)
