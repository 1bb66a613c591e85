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


class TestPhiFourPallas:
    def test_matches_target_dirichlet(self, key):
        from mfm_tpu.ops import phi_four_log_lik
        from mfm_tpu.targets import PhiFour

        pf = PhiFour(64)
        x = jax.random.normal(key, (37, 64))  # non-multiple of tile
        got = phi_four_log_lik(x, tile=256)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(pf.log_lik(x)), rtol=2e-4
        )

    def test_matches_target_pbc(self, key):
        from mfm_tpu.ops import phi_four_log_lik
        from mfm_tpu.targets import PhiFour

        pf = PhiFour(32, bc=("pbc", 0.0))
        x = jax.random.normal(key, (16, 32))
        got = phi_four_log_lik(x, pbc=True, tile=256)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(pf.log_lik(x)), rtol=2e-4
        )
