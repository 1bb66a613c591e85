"""MALA kernel: acceptance-formula correctness, target invariance,
ensemble-batch semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from mfm_tpu.kernels import mala
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


def _gauss_vs(target):
    return lambda x: target.value_and_score(x)


class TestMALAAcceptance:
    def test_hand_computed_acceptance_1d(self, key):
        """Check p_accept against the MALA formula computed by hand."""
        target = IndepGaussian(1)
        vs = _gauss_vs(target)
        kernel = mala.build_kernel(vs)
        h = 0.5
        x0 = jnp.array([[1.0]])
        state = mala.init(x0, vs)
        _, info = kernel(key, state, h)

        x, xp = float(x0[0, 0]), float(info.proposed_position[0, 0])

        def logpi(v):
            return -0.5 * v * v - 0.5 * np.log(2 * np.pi)

        def logq(b, a):  # q(b | a)
            mean = a + h * (-a)  # grad logpi = -x for N(0,1)
            return -((b - mean) ** 2) / (4 * h) - 0.5 * np.log(4 * np.pi * h)

        expected = min(1.0, np.exp(logpi(xp) + logq(x, xp) - logpi(x) - logq(xp, x)))
        np.testing.assert_allclose(float(info.acceptance_rate[0]), expected, rtol=1e-4)

    def test_gaussian_invariance(self, key):
        """Long MALA run on N(0, I) must reproduce its first two moments."""
        target = IndepGaussian(2)
        vs = _gauss_vs(target)
        kernel = mala.build_kernel(vs)
        n_chain, n_steps = 256, 600
        state = mala.init(jax.random.normal(key, (n_chain, 2)), vs)
        final, positions, acc = mala.run_chain(key, kernel, state, 0.5, n_steps)
        # discard warmup, pool chains x steps
        pool = positions[n_steps // 2 :].reshape(-1, 2)
        np.testing.assert_allclose(pool.mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(pool.var(axis=0), 1.0, atol=0.08)
        assert 0.3 < float(acc.mean()) < 1.0

    def test_anisotropic_invariance(self, key):
        target = IndepGaussian(3, mean=2.0, var=4.0)
        vs = _gauss_vs(target)
        kernel = mala.build_kernel(vs)
        state = mala.init(2.0 + jax.random.normal(key, (512, 3)), vs)
        _, positions, _ = mala.run_chain(key, kernel, state, 1.0, 800)
        pool = positions[400:].reshape(-1, 3)
        np.testing.assert_allclose(pool.mean(axis=0), 2.0, atol=0.15)
        np.testing.assert_allclose(pool.var(axis=0), 4.0, rtol=0.1)

    def test_state_consistency(self, key):
        """Cached logdensity/grad in the state must match recomputation."""
        target = four_mode_mixture()
        vs = _gauss_vs(target)
        kernel = mala.build_kernel(vs)
        state = mala.init(jax.random.normal(key, (32, 2)), vs)
        for i in range(3):
            key, sub = jax.random.split(key)
            state, _ = kernel(sub, state, 0.2)
        ld, grad = vs(state.position)
        np.testing.assert_allclose(state.logdensity, ld, rtol=1e-5)
        np.testing.assert_allclose(state.logdensity_grad, grad, rtol=1e-5, atol=1e-6)

    def test_rejected_chains_keep_position(self, key):
        target = IndepGaussian(2)
        vs = _gauss_vs(target)
        kernel = mala.build_kernel(vs)
        x0 = jax.random.normal(key, (64, 2)) * 3
        state = mala.init(x0, vs)
        new_state, info = kernel(key, state, 5.0)  # huge step -> many rejections
        rejected = ~info.is_accepted
        assert bool(rejected.any())
        np.testing.assert_array_equal(
            np.asarray(new_state.position)[np.asarray(rejected)],
            np.asarray(x0)[np.asarray(rejected)],
        )

    def test_tempered_target(self, key):
        """beta-tempered Gaussian has variance 1/beta."""
        target = IndepGaussian(2)
        beta = 0.25
        vs = lambda x: (
            target.tempered_log_prob(x, beta),
            jax.vmap(jax.grad(lambda v: target.tempered_log_prob(v, beta)))(x),
        )
        kernel = mala.build_kernel(vs)
        state = mala.init(jax.random.normal(key, (512, 2)), vs)
        _, positions, _ = mala.run_chain(key, kernel, state, 1.0, 800)
        pool = positions[400:].reshape(-1, 2)
        np.testing.assert_allclose(pool.var(axis=0), 1.0 / beta, rtol=0.1)
