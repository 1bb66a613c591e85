"""Pallas pairwise kernels (interpret mode on CPU) vs the pure-JAX tiled
implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from mfm_tpu.diagnostics import max_mean_disc, stein_disc
from mfm_tpu.ops import max_mean_disc_pallas, stein_disc_pallas
from mfm_tpu.targets import four_mode_mixture


class TestPallasPairwise:
    def test_stein_matches_jax(self, key):
        target = four_mode_mixture()
        X = jax.random.normal(key, (70, 2)) * 4
        u_ref, v_ref = stein_disc(X, target.score, tile=32)
        u_pl, v_pl = stein_disc_pallas(X, target.score, tile=32)
        np.testing.assert_allclose(float(u_pl), float(u_ref), rtol=2e-4)
        np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=2e-4)

    def test_mmd_matches_jax(self, key):
        X = jax.random.normal(key, (50, 3))
        Y = jax.random.normal(jax.random.fold_in(key, 1), (50, 3)) + 1
        ref = max_mean_disc(X, Y, tile=16)
        got = max_mean_disc_pallas(X, Y, tile=32)
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-4, atol=1e-6)
