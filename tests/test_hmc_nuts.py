"""HMC / NUTS ensemble kernels + window adaptation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.adaptation.window import (
    build_schedule,
    window_adaptation,
)
from mfm_tpu.kernels import hmc, mala, nuts
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


def _run(kernel_step, state, key, n_steps):
    @jax.jit
    def go(state, key):
        def body(s, k):
            s, info = kernel_step(k, s)
            return s, (s.position, info.acceptance_rate)

        return jax.lax.scan(body, state, jax.random.split(key, n_steps))

    _, (positions, acc) = go(state, key)
    return positions, acc


class TestHMC:
    def test_gaussian_invariance(self, key):
        target = IndepGaussian(3)
        vs = lambda x: target.value_and_score(x)
        algo = hmc.hmc(vs, step_size=0.25, num_integration_steps=8)
        state = algo.init(jax.random.normal(key, (256, 3)))
        positions, acc = _run(algo.step, state, key, 400)
        pool = positions[200:].reshape(-1, 3)
        np.testing.assert_allclose(pool.mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(pool.var(axis=0), 1.0, atol=0.08)
        assert float(acc.mean()) > 0.8  # well-tuned HMC on a Gaussian

    @pytest.mark.slow
    def test_anisotropic_with_mass(self, key):
        """Matching the inverse mass to the target variance equalizes scales."""
        target = IndepGaussian(2, mean=1.0, var=9.0)
        vs = lambda x: target.value_and_score(x)
        algo = hmc.hmc(
            vs, step_size=0.6, num_integration_steps=8,
            inverse_mass=jnp.array([9.0, 9.0]),
        )
        state = algo.init(1.0 + jax.random.normal(key, (256, 2)))
        positions, acc = _run(algo.step, state, key, 500)
        pool = positions[250:].reshape(-1, 2)
        np.testing.assert_allclose(pool.mean(axis=0), 1.0, atol=0.15)
        np.testing.assert_allclose(pool.var(axis=0), 9.0, rtol=0.12)

    @pytest.mark.slow
    def test_energy_conservation_small_steps(self, key):
        """With tiny steps the acceptance must be ~1 (leapfrog correctness)."""
        target = four_mode_mixture()
        vs = lambda x: target.value_and_score(x)
        kernel = hmc.build_kernel(vs)
        state = mala.init(target.sample(key, (64,)), vs)
        _, info = kernel(key, state, 0.01, 5, None)
        assert float(info.acceptance_rate.mean()) > 0.999


class TestNUTS:
    @pytest.mark.slow
    def test_gaussian_invariance(self, key):
        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)
        algo = nuts.nuts(vs, step_size=0.4, max_depth=5)
        state = algo.init(jax.random.normal(key, (256, 2)))
        positions, acc = _run(algo.step, state, key, 300)
        pool = positions[150:].reshape(-1, 2)
        np.testing.assert_allclose(pool.mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(pool.var(axis=0), 1.0, atol=0.08)

    @pytest.mark.slow
    def test_correlated_gaussian_invariance(self, key):
        """NUTS must handle scale separation via longer trajectories."""
        from mfm_tpu.targets import GaussianMixture

        std = jnp.array([1.0, 10.0])
        target = GaussianMixture(
            modes=jnp.zeros((1, 2)), covs=(std**2)[None, :], weights=jnp.ones(1)
        )
        vs = lambda x: target.value_and_score(x)
        algo = nuts.nuts(vs, step_size=0.5, max_depth=7)
        state = algo.init(jax.random.normal(key, (128, 2)) * std)
        positions, _ = _run(algo.step, state, key, 400)
        pool = positions[200:].reshape(-1, 2)
        np.testing.assert_allclose(pool.var(axis=0), np.asarray(std) ** 2, rtol=0.15)

    @pytest.mark.slow
    def test_uses_multiple_doublings(self, key):
        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)
        kernel = nuts.build_kernel(vs, max_depth=6)
        state = mala.init(jax.random.normal(key, (64, 2)), vs)
        _, info = kernel(key, state, 0.2, None)
        assert float(info.num_doublings.mean()) > 1.5
        assert not bool(info.is_divergent.any())

    def test_divergence_flagged_for_huge_steps(self, key):
        target = IndepGaussian(2, var=0.0001)
        vs = lambda x: target.value_and_score(x)
        kernel = nuts.build_kernel(vs, max_depth=4)
        state = mala.init(jax.random.normal(key, (32, 2)), vs)
        _, info = kernel(key, state, 50.0, None)
        assert bool(info.is_divergent.any())


class TestNUTSIterative:
    """The checkpointed O(max_depth)-program variant must match the static
    unroll distributionally (same semantics, different control flow)."""

    def _vs(self):
        scales = jnp.arange(1.0, 5.0)

        def vs(x):
            return -0.5 * jnp.sum(x * x * scales, -1), -x * scales

        return vs

    @pytest.mark.slow
    def test_matches_static_moments_and_depth(self, key):
        vs = self._vs()
        state = mala.init(jax.random.normal(key, (256, 4)), vs)

        def run(kernel, seed):
            @jax.jit
            def go(state, k):
                def body(s, kk):
                    s, info = kernel(kk, s, 0.35)
                    return s, (s.position, info.acceptance_rate,
                               info.num_doublings)

                return jax.lax.scan(
                    body, state, jax.random.split(jax.random.PRNGKey(seed), 300)
                )

            _, (pos, acc, dep) = go(state, key)
            return pos[150:].reshape(-1, 4), float(acc.mean()), float(dep.mean())

        pool_s, acc_s, dep_s = run(nuts.build_kernel(vs, 5, variant="static"), 1)
        pool_i, acc_i, dep_i = run(
            nuts.build_kernel(vs, 5, variant="iterative"), 2
        )
        expected_var = 1.0 / np.arange(1.0, 5.0)
        np.testing.assert_allclose(pool_s.var(axis=0), expected_var, rtol=0.15)
        np.testing.assert_allclose(pool_i.var(axis=0), expected_var, rtol=0.15)
        np.testing.assert_allclose(pool_i.mean(axis=0), 0.0, atol=0.08)
        # same termination behavior: realized tree depth & acceptance agree
        assert abs(dep_s - dep_i) < 0.2, (dep_s, dep_i)
        assert abs(acc_s - acc_i) < 0.05, (acc_s, acc_i)

    @pytest.mark.slow
    def test_deep_tree_compiles_fast(self, key):
        """max_depth=10 would unroll 1023 leapfrogs statically; the
        iterative program is O(max_depth) and compiles in seconds."""
        import time

        vs = self._vs()
        kernel = nuts.build_kernel(vs, max_depth=10)  # auto -> iterative
        state = mala.init(jax.random.normal(key, (64, 4)), vs)
        start = time.time()
        new, info = jax.jit(lambda s, k: kernel(k, s, 0.3))(state, key)
        jax.block_until_ready(new.position)
        assert time.time() - start < 60.0
        assert not bool(info.is_divergent.any())

    def test_divergence_flagged(self, key):
        vs = lambda x: (-0.5 * jnp.sum(x * x, -1) / 1e-4, -x / 1e-4)
        kernel = nuts.build_kernel(vs, max_depth=4, variant="iterative")
        state = mala.init(jax.random.normal(key, (32, 2)), vs)
        _, info = kernel(key, state, 50.0, None)
        assert bool(info.is_divergent.any())


class TestWindowAdaptation:
    def test_schedule_partition(self):
        is_slow, is_end = build_schedule(1000)
        assert not bool(is_slow[:75].any())  # fast init buffer
        assert not bool(is_slow[-50:].any())  # fast term buffer
        assert bool(is_slow[75:-50].all())
        assert int(is_end.sum()) >= 3  # several doubling windows

    def test_adapts_step_and_mass(self, key):
        target = IndepGaussian(2, var=16.0)
        vs = lambda x: target.value_and_score(x)
        hmc_kernel = hmc.build_kernel(vs)

        def kernel(k, s, step_size, inv_mass):
            return hmc_kernel(k, s, step_size, 8, inv_mass)

        adapt = window_adaptation(
            kernel,
            lambda pos: mala.init(pos, vs),
            num_steps=600,
            initial_step_size=0.05,
        )
        state, (step_size, inv_mass), acc = adapt.run(
            key, 4.0 * jax.random.normal(key, (128, 2))
        )
        # mass estimate ~ target variance, acceptance near the 0.8 target
        np.testing.assert_allclose(np.asarray(inv_mass), 16.0, rtol=0.3)
        assert 0.6 < float(np.asarray(acc)[-50:].mean()) <= 1.0
        assert float(step_size) > 0.05  # grew from the tiny initial value
