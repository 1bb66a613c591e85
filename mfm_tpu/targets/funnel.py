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
