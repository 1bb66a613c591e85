"""SVGD / coin-SVGD, COCOB, adaptation loops (cross-chain, parallel ECA,
ATESS/MSC/MSC-MALA), SNPE scaffolding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mfm_tpu.adaptation import atess, cross_chain, msc, msc_mala, parallel_eca
from mfm_tpu.kernels import mala
from mfm_tpu.optimizers import cocob
from mfm_tpu.sbi import SNPE_A
from mfm_tpu.targets import IndepGaussian
from mfm_tpu.vi import coin_svgd, median_heuristic, svgd


class TestSVGD:
    def test_converges_to_gaussian(self, key):
        target = IndepGaussian(2, mean=2.0, var=1.0)
        algo = svgd(target.score, optax.sgd(0.3))
        state = algo.init(jax.random.normal(key, (128, 2)) - 2.0)

        @jax.jit
        def step(state):
            return algo.step(state)

        for _ in range(300):
            state = step(state)
        particles = np.asarray(state.particles)
        np.testing.assert_allclose(particles.mean(axis=0), 2.0, atol=0.1)
        # SVGD underestimates variance slightly with few particles
        assert 0.5 < particles.var(axis=0).mean() < 1.5

    def test_coin_svgd_converges(self, key):
        target = IndepGaussian(2, mean=-1.0, var=0.5)
        algo = coin_svgd(target.score)
        state = algo.init(jax.random.normal(key, (64, 2)) + 1.0)

        @jax.jit
        def step(state):
            return algo.step(state)

        for _ in range(200):
            state = step(state)
        np.testing.assert_allclose(
            np.asarray(state.particles).mean(axis=0), -1.0, atol=0.2
        )

    def test_median_heuristic_positive(self, key):
        p = jax.random.normal(key, (32, 3))
        assert float(median_heuristic(p)) > 0


class TestCocob:
    def test_minimizes_quadratic(self):
        opt = cocob()
        w = jnp.array([5.0, -3.0])
        state = opt.init(w)
        loss = lambda w: jnp.sum((w - 1.0) ** 2)
        for _ in range(200):
            g = jax.grad(loss)(w)
            updates, state = opt.update(g, state, w)
            w = optax.apply_updates(w, updates)
        np.testing.assert_allclose(np.asarray(w), 1.0, atol=0.05)


def _flow_and_loss(key, dim=2):
    """Tiny CNF flow + FM-style fit loss for adaptation tests."""
    from mfm_tpu.flows import make_transport, make_vector_field

    apply_fn, params = make_vector_field(
        key, dim, hidden_x=(8,), hidden_t=(8,), hidden_xt=(8,), fourier_dim=4
    )
    transport = make_transport(apply_fn, divergence="exact", n_steps=4)

    def flow(u, p):
        return transport.forward(p, u)

    def loss_fn(p, positions):
        # simple pullback-Gaussianization objective: -log q_flow(positions)
        u, logdet = transport.inverse(p, positions)
        return jnp.mean(0.5 * jnp.sum(u * u, axis=-1) + logdet)

    return flow, loss_fn, params


class TestAdaptation:
    def test_cross_chain_runs(self, key):
        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)

        def kernel_factory(step_size):
            k = mala.build_kernel(vs)
            return lambda key, s: k(key, s, step_size)

        def parameter_gn(states, step, step_size):
            return (step_size * 1.0,)  # constant params, exercise plumbing

        init, update = cross_chain(kernel_factory, parameter_gn, 32)
        state = init(mala.init(jax.random.normal(key, (32, 2)), vs))
        for i in range(3):
            state, params, infos = update(jax.random.fold_in(key, i), state, 0.5)
        assert jnp.all(jnp.isfinite(state.states.position))

    def test_cross_chain_shape_check(self, key):
        init, _ = cross_chain(lambda *a: None, lambda *a: a, 16)
        with pytest.raises(ValueError):
            init(mala.init(jnp.zeros((8, 2)), lambda x: (jnp.zeros(8), jnp.zeros((8, 2)))))

    def test_parallel_eca_local(self, key):
        """vmap path: params rotate between batches, skip batch holds."""
        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)

        def kernel_factory(step_size):
            k = mala.build_kernel(vs)
            return lambda key, s: k(key, s, step_size)

        def parameter_gn(states, step, step_size):
            return (step_size + 0.0,)

        num_batch, batch_size = 4, 8
        init, update = parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size
        )
        pos = jax.random.normal(key, (num_batch, batch_size, 2))
        states = jax.vmap(lambda p: mala.init(p, vs))(pos)
        state = init(states)
        params0 = (0.5 * jnp.ones(num_batch),)
        for i in range(3):
            state, params, _ = update(jax.random.fold_in(key, i), state, *params0)
        assert state.states.position.shape == (num_batch, batch_size, 2)
        assert jnp.all(jnp.isfinite(state.states.position))

    @pytest.mark.slow
    def test_parallel_eca_sharded_matches_local(self, key, devices):
        """shard_map + ppermute path must agree with the vmap path."""
        from mfm_tpu.parallel import make_mesh

        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)

        def kernel_factory(step_size):
            k = mala.build_kernel(vs)
            return lambda key, s: k(key, s, step_size)

        def parameter_gn(states, step, step_size):
            # parameters actually depend on the data so rotation matters
            return (0.1 + 0.01 * jnp.mean(states.position**2),)

        num_batch, batch_size = 8, 4
        pos = jax.random.normal(key, (num_batch, batch_size, 2))
        states = jax.vmap(lambda p: mala.init(p, vs))(pos)
        params0 = (0.2 * jnp.ones(num_batch),)

        init_l, update_l = parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size
        )
        s_l = init_l(states)
        s_l, p_l, _ = update_l(key, s_l, *params0)

        mesh = make_mesh((8,), ("ensemble",), devices[:8])
        init_s, update_s = parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size, mesh=mesh
        )
        s_s = init_s(states)
        s_s, p_s, _ = update_s(key, s_s, *params0)

        np.testing.assert_allclose(
            np.asarray(s_l.states.position), np.asarray(s_s.states.position),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(p_l[0]), np.asarray(p_s[0]), rtol=1e-5
        )

    @pytest.mark.slow
    def test_atess_warmup_runs(self, key):
        target = IndepGaussian(2)
        flow, loss_fn, params = _flow_and_loss(key)
        algo = atess(
            target.log_prob,
            optax.adam(1e-3),
            params,
            flow,
            loss_fn,
            num_batch=1,
            batch_size=16,
            num_steps=5,
            eca=False,
        )
        last_state, kernel_fn, fitted = algo.run(
            key, jax.random.normal(key, (16, 2))
        )
        assert jnp.all(jnp.isfinite(last_state.states.position))
        new_state, _ = kernel_fn(key, last_state.states)
        assert jnp.all(jnp.isfinite(new_state.position))

    @pytest.mark.slow
    def test_msc_warmup_runs(self, key):
        target = IndepGaussian(2)
        flow, loss_fn, params = _flow_and_loss(key)
        algo = msc(
            target.log_prob,
            optax.adam(1e-3),
            params,
            flow,
            loss_fn,
            num_chain=16,
            num_steps=5,
            num_importance_samples=3,
        )
        last_state, kernel_fn, fitted, infos = algo.run(
            key, jax.random.normal(key, (16, 2))
        )
        assert jnp.all(jnp.isfinite(last_state.states.position))

    @pytest.mark.slow
    def test_msc_mala_warmup_runs(self, key):
        target = IndepGaussian(2)
        flow, loss_fn, params = _flow_and_loss(key)
        algo = msc_mala(
            lambda x: target.value_and_score(x),
            optax.adam(1e-3),
            params,
            flow,
            loss_fn,
            num_chain=16,
            step_size=0.3,
            num_steps=5,
            num_mala_samples=2,
        )
        last_state, kernel_fn, fitted, infos = algo.run(
            key, jax.random.normal(key, (16, 2))
        )
        assert jnp.all(jnp.isfinite(last_state.states.position))


class TestSNPE:
    def test_snpe_a_loss(self, key):
        prior_gn = lambda k: jax.random.normal(k, (2,))
        likelihood_gn = lambda k, theta: theta + 0.1 * jax.random.normal(k, (2,))

        def approx_logprob(params, theta, data):
            return -0.5 * jnp.sum((data - theta - params) ** 2)

        snpe = SNPE_A(approx_logprob, 1, likelihood_gn, prior_gn)
        loss = snpe.get_loss_function(key, 64)
        val, grad = jax.value_and_grad(loss)(jnp.zeros(2))
        assert jnp.isfinite(val)
        assert jnp.all(jnp.isfinite(grad))


class TestECAMultiBatchPerDevice:
    @pytest.mark.slow
    def test_sharded_two_batches_per_device(self, key, devices):
        """num_batch=16 on 8 devices (2 local batches): rotation must still
        shift by ONE batch globally, matching the vmap path."""
        from mfm_tpu.parallel import make_mesh

        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)

        def kernel_factory(step_size):
            k = mala.build_kernel(vs)
            return lambda key, s: k(key, s, step_size)

        def parameter_gn(states, step, step_size):
            return (0.05 + 0.01 * jnp.mean(states.position**2),)

        num_batch, batch_size = 16, 4
        pos = jax.random.normal(key, (num_batch, batch_size, 2))
        states = jax.vmap(lambda p: mala.init(p, vs))(pos)
        params0 = (0.2 * jnp.ones(num_batch),)

        init_l, update_l = parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size
        )
        s_l, p_l, _ = update_l(key, init_l(states), *params0)

        mesh = make_mesh((8,), ("ensemble",), devices[:8])
        init_s, update_s = parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size, mesh=mesh
        )
        s_s, p_s, _ = update_s(key, init_s(states), *params0)

        np.testing.assert_allclose(
            np.asarray(s_l.states.position), np.asarray(s_s.states.position),
            rtol=1e-4, atol=1e-5,
        )
