"""TESS + standalone CIS kernels: invariance with identity flow, flow
consistency, batched-loop semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from mfm_tpu.kernels import cis, tess
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


def identity_flow(u):
    """Trivial transport: x = u, logdet = 0."""
    return u, jnp.zeros(u.shape[:1], u.dtype)


class TestTESS:
    def test_identity_flow_gaussian_invariance(self, key):
        """With the identity flow, TESS is elliptical slice sampling on
        pi(x) * N(momentum); a standard normal target must stay invariant."""
        target = IndepGaussian(2)
        kernel = tess.build_kernel()
        n_chain, n_steps = 256, 400
        state = tess.init(jax.random.normal(key, (n_chain, 2)))

        @jax.jit
        def run(state, key):
            def body(s, k):
                s, info = kernel(k, s, target.log_prob, identity_flow)
                return s, s.position

            return jax.lax.scan(body, state, jax.random.split(key, n_steps))

        _, positions = run(state, key)
        pool = positions[n_steps // 2 :].reshape(-1, 2)
        # TESS with identity flow targets pi(x) exp(-.5||m||^2)... the slice
        # function is logprob(x) - .5||m||^2, so x targets pi itself
        np.testing.assert_allclose(pool.mean(axis=0), 0.0, atol=0.06)
        np.testing.assert_allclose(pool.var(axis=0), 1.0, atol=0.12)

    def test_always_accepts_eventually(self, key):
        target = four_mode_mixture()
        kernel = tess.build_kernel()
        state = tess.init(jax.random.normal(key, (64, 2)))
        new_state, info = kernel(key, state, target.log_prob, identity_flow)
        assert jnp.all(jnp.isfinite(new_state.position))
        assert jnp.all(info.subiter >= 1)

    def test_affine_flow_targets_pushforward(self, key):
        """With flow x = 2u (logdet = d log 2), TESS samples u such that
        x = 2u follows the target."""
        target = IndepGaussian(2, mean=1.0, var=4.0)

        def flow(u):
            return 2.0 * u, jnp.full(u.shape[:1], 2.0 * jnp.log(2.0))

        kernel = tess.build_kernel()
        state = tess.init(jax.random.normal(key, (256, 2)))

        @jax.jit
        def run(state, key):
            def body(s, k):
                s, _ = kernel(k, s, target.log_prob, flow)
                return s, s.position

            return jax.lax.scan(body, state, jax.random.split(key, 400))

        _, positions = run(state, key)
        pool = positions[200:].reshape(-1, 2)
        np.testing.assert_allclose(pool.mean(axis=0), 1.0, atol=0.1)
        np.testing.assert_allclose(pool.var(axis=0), 4.0, rtol=0.15)


class TestCIS:
    def test_identity_flow_gaussian_mixture(self, key):
        """CIS with identity flow == importance resampling from N(0, I)
        proposals; on a well-covered target the chain must follow pi."""
        target = IndepGaussian(1, mean=0.5, var=0.25)
        kernel = cis.build_kernel(num_samples=32)
        state = cis.init(jax.random.normal(key, (512, 1)))

        @jax.jit
        def run(state, key):
            def body(s, k):
                s, _ = kernel(k, s, target.log_prob, identity_flow)
                return s, s.position

            return jax.lax.scan(body, state, jax.random.split(key, 50))

        _, positions = run(state, key)
        pool = positions[25:].reshape(-1)
        np.testing.assert_allclose(pool.mean(), 0.5, atol=0.03)
        np.testing.assert_allclose(pool.var(), 0.25, rtol=0.1)

    def test_weights_and_selection_shapes(self, key):
        target = four_mode_mixture()
        kernel = cis.build_kernel(num_samples=4)
        state = cis.init(jax.random.normal(key, (8, 2)))
        new_state, info = kernel(key, state, target.log_prob, identity_flow)
        assert info.positions.shape == (8, 5, 2)
        assert info.log_weights.shape == (8, 5)
        assert new_state.position.shape == (8, 2)
        # selected position must be one of the candidates
        for b in range(8):
            diffs = np.abs(
                np.asarray(info.positions[b]) - np.asarray(new_state.position[b])
            ).sum(axis=1)
            assert diffs.min() < 1e-6
