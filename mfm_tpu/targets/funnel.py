"""Neal's funnel and many-well targets.

These are the remaining benchmark densities named by the driver baseline
(BASELINE.json configs: "Neal's funnel + many-well targets"); the reference
reaches them only through external fabjax experiment configs
(/root/reference/config/funnel.yaml, config/many_well.yaml;
exe_others.py:50-56). Here they are first-class batch-first targets.
"""

import math

import jax
import jax.numpy as jnp

from mfm_tpu.targets.base import Target

_LOG2PI = math.log(2.0 * math.pi)


class Funnel(Target):
    """Neal's funnel: v ~ N(0, 9), x_i | v ~ N(0, exp(v)) for i < dim-1.

    The funnel dimension is the last coordinate.
    """

    def __init__(self, dim: int = 10, sigma_v: float = 3.0):
        self.dim = dim
        self.sigma_v = sigma_v

    def log_lik(self, x):
        v = x[..., -1]
        rest = x[..., :-1]
        k = self.dim - 1
        lp_v = -0.5 * (v / self.sigma_v) ** 2 - 0.5 * (
            _LOG2PI + 2.0 * jnp.log(self.sigma_v)
        )
        lp_rest = -0.5 * jnp.sum(rest * rest, axis=-1) * jnp.exp(-v) - 0.5 * k * (
            _LOG2PI + v
        )
        return lp_v + lp_rest

    def log_prior(self, x):
        return jnp.zeros(x.shape[:-1], x.dtype)

    def sample(self, key, shape=()):
        key_v, key_x = jax.random.split(key)
        v = self.sigma_v * jax.random.normal(key_v, shape + (1,))
        x = jnp.exp(0.5 * v) * jax.random.normal(key_x, shape + (self.dim - 1,))
        return jnp.concatenate([x, v], axis=-1)


class ManyWell(Target):
    """Product of double-well pairs: the standard many-well benchmark.

    Each consecutive coordinate pair (x1, x2) contributes
        log p = -x1^4 + 6 x1^2 + 1/2 x1 - 1/2 x2^2
    (the 2-D double well of the FAB/annealed-flow-transport literature),
    so dim = 2 * n_wells gives 2^n_wells modes.
    """

    def __init__(self, dim: int = 32):
        assert dim % 2 == 0, "ManyWell dim must be even"
        self.dim = dim

    def log_lik(self, x):
        shape = x.shape[:-1]
        pairs = x.reshape(shape + (self.dim // 2, 2))
        x1 = pairs[..., 0]
        x2 = pairs[..., 1]
        well = -(x1**4) + 6.0 * x1**2 + 0.5 * x1 - 0.5 * x2**2
        return jnp.sum(well, axis=-1)

    def log_prior(self, x):
        return jnp.zeros(x.shape[:-1], x.dtype)

    def init_positions(self, key, n_chain):
        return jax.random.normal(key, (n_chain, self.dim))

    # inverse-CDF grid for the x1 marginal. The per-well density factorizes
    # as p(x1) * N(x2; 0, 1) with p(x1) ∝ exp(-x1^4 + 6 x1^2 + x1/2), a 1-D
    # quartic exponential: outside |x1| <= 3.5 the density is < e^-80 of the
    # mode, so a dense trapezoid CDF on [-3.5, 3.5] is exact to f32.
    _GRID_N = 8193
    _GRID_LIM = 3.5

    def _x1_cdf_grid(self):
        grid = jnp.linspace(-self._GRID_LIM, self._GRID_LIM, self._GRID_N)
        logp = -(grid**4) + 6.0 * grid**2 + 0.5 * grid
        p = jnp.exp(logp - jnp.max(logp))
        # trapezoid cumulative integral, normalized
        cdf = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(0.5 * (p[1:] + p[:-1]))]
        )
        return grid, cdf / cdf[-1]

    def sample(self, key, shape=()):
        """Exact sampler: iid inverse-CDF draws of x1 per well + N(0,1) x2.

        New capability vs the reference (many-well appears there only as a
        fabjax config, /root/reference/config/many_well.yaml): ground-truth
        samples enable the MMD metric for this target.
        """
        n_wells = self.dim // 2
        grid, cdf = self._x1_cdf_grid()
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, shape + (n_wells,))
        hi = jnp.clip(jnp.searchsorted(cdf, u), 1, self._GRID_N - 1)
        c_lo, c_hi = cdf[hi - 1], cdf[hi]
        frac = (u - c_lo) / jnp.maximum(c_hi - c_lo, 1e-30)
        x1 = grid[hi - 1] + frac * (grid[hi] - grid[hi - 1])
        x2 = jax.random.normal(k2, shape + (n_wells,))
        return jnp.stack([x1, x2], axis=-1).reshape(shape + (self.dim,))
