"""Flow-annealed SMC (VERDICT r2 next-item 1): the latent-space pullback
target and the adaptive annealing driver that turns a trained CNF into a
weighted sampler with by-construction healthy per-increment ESS.

Reference anchor: the single-jump IS correction exe_flow_matching.py:453-459
is the lambda: 0 -> 1 special case of this path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import MFMConfig, preset
from mfm_tpu.flows.pullback import FlowPullbackTarget
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


class _AffineTransport:
    """Fake transport T(u) = a * u + b with exact analytic logdet, for
    closed-form checks of the pullback density algebra."""

    def __init__(self, a, b):
        self.a, self.b = a, b

    def forward(self, params, u, key=None):
        d = u.shape[-1]
        logdet = jnp.full(u.shape[:1], d * jnp.log(self.a))
        return self.a * u + self.b, logdet


class TestFlowPullbackTarget:
    def test_analytic_density(self, key):
        """With T affine and pi Gaussian, rho_1(u) = pi(T(u)) |J| is a known
        Gaussian in u; ell and the tempered density must match it."""
        a, b = 2.0, 1.0
        d = 3
        target = IndepGaussian(d, mean=4.0, var=2.0)  # pi = N(4, 2)
        ref = IndepGaussian(d)  # q0 = N(0, 1)
        pt = FlowPullbackTarget(target, _AffineTransport(a, b), None, ref)

        u = jax.random.normal(key, (16, d))
        # ell = log pi(au+b) + d log a - log q0(u)
        x = a * u + b
        want = (
            target.log_prob(x) + d * jnp.log(a) - ref.log_prob(u)
        )
        np.testing.assert_allclose(
            np.asarray(pt.log_lik(u)), np.asarray(want), rtol=1e-5
        )
        # log_prior is q0 itself and log_prob telescopes to pi(T(u)) |J|
        np.testing.assert_allclose(
            np.asarray(pt.log_prob(u)),
            np.asarray(target.log_prob(x) + d * jnp.log(a)),
            rtol=1e-5,
        )

    def test_tempered_value_and_score_matches_autodiff(self, key):
        """The fused one-ODE-solve value-and-grad must equal per-sample
        autodiff of (1-beta) log q0 + beta (log pi(T) + logdet)."""
        a, b, d, beta = 1.5, -0.5, 4, 0.37
        target = IndepGaussian(d, mean=2.0, var=0.5)
        ref = IndepGaussian(d)
        pt = FlowPullbackTarget(target, _AffineTransport(a, b), None, ref)
        u = jax.random.normal(key, (8, d))

        vals, grads = pt.tempered_value_and_score(u, beta)

        def single(ui):
            x = a * ui + b
            return (1.0 - beta) * ref.log_prob(ui) + beta * (
                target.log_prob(x) + d * jnp.log(a)
            )

        want_v, want_g = jax.vmap(jax.value_and_grad(single))(u)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grads), np.asarray(want_g), rtol=1e-5)

    def test_init_positions_are_reference_draws(self, key):
        d = 2
        ref = IndepGaussian(d, var=4.0)
        pt = FlowPullbackTarget(
            IndepGaussian(d), _AffineTransport(1.0, 0.0), None, ref
        )
        u = pt.init_positions(key, 4096)
        assert u.shape == (4096, d)
        np.testing.assert_allclose(np.asarray(u).var(), 4.0, rtol=0.1)


class TestFlowAnnealedSMC:
    @pytest.mark.slow
    def test_4mode_end_to_end(self, key):
        """Train a small flow, anneal q0 -> pi: lambda must hit 1, the
        log-normalizer of the (normalized) 4-mode mixture must come out
        near 0, and the pushed-forward particles must carry the mixture's
        per-coordinate second moment (mode offset^2 + 1)."""
        from mfm_tpu.drivers.flow_smc import run_flow_smc
        from mfm_tpu.drivers.mfm import run_mfm

        cfg = preset(
            "4-mode", learning_iter=300, num_chain=64, eval_iter=2,
            chunk_size=100, ode_steps=8,
        )
        target = four_mode_mixture()
        run = run_mfm(target, cfg)
        r = run_flow_smc(
            target, cfg, run.transport, run.train.params, run.ref_dist,
            key=jax.random.PRNGKey(0), n_particles=256, n_steps=12,
            num_mcmc_steps=3,
        )
        assert float(r.lmbda) == 1.0
        assert abs(float(r.log_z)) < 0.3
        assert float(r.ess_fraction) > 0.5
        s = np.asarray(r.samples)
        real = np.asarray(target.sample(jax.random.PRNGKey(1), (4096,)))
        np.testing.assert_allclose(
            (s**2).mean(0), (real**2).mean(0), rtol=0.15
        )

    def test_unsaturated_run_keeps_weights(self, key):
        """Stopping before lambda = 1 must return non-uniform weights whose
        ESS fraction still respects the adaptive target alpha."""
        from mfm_tpu.drivers.flow_smc import run_flow_smc

        d = 8
        target = IndepGaussian(d, mean=3.0, var=0.5)
        ref = IndepGaussian(d)
        cfg = MFMConfig(
            dim=d, num_chain=128, step_size=0.3, alpha=0.8,
            anneal_iter=200, num_anneal_temp=100,
        )
        r = run_flow_smc(
            target, cfg, _AffineTransport(1.0, 0.0), None, ref,
            key=key, n_steps=2, num_mcmc_steps=2,
        )
        assert 0.0 < float(r.lmbda) < 1.0
        assert float(r.ess_fraction) >= 0.5 * cfg.alpha
        assert float(r.ess_fraction) < 0.9999  # genuinely weighted


class TestLatentTESSKernel:
    def test_tess_inner_kernel_targets_gaussian(self, key):
        """With an affine transport and Gaussian target the tempered latent
        target is Gaussian; TESS moves (gradient-free, tuning-free) must
        anneal to lambda=1 and land the posterior moments."""
        from mfm_tpu.drivers.flow_smc import run_flow_smc

        d = 4
        target = IndepGaussian(d, mean=3.0, var=0.5)
        ref = IndepGaussian(d)
        cfg = MFMConfig(dim=d, num_chain=256, alpha=0.8)
        # the N(0,1) ellipse prior sits 3 sigma from the target mean, the
        # hard regime for elliptical slice moves — give the anneal a real
        # move budget (in flow-SMC use the ellipse prior is the flow
        # reference, i.e. well matched by construction)
        r = run_flow_smc(
            target, cfg, _AffineTransport(1.0, 0.0), None, ref,
            key=key, n_steps=25, num_mcmc_steps=10, inner_kernel="tess",
        )
        assert float(r.lmbda) == 1.0
        s = np.asarray(r.samples)
        np.testing.assert_allclose(s.mean(0), 3.0, atol=0.25)
        np.testing.assert_allclose(s.var(0), 0.5, rtol=0.4)

    def test_noncentered_ellipse_mean(self, key):
        """A reference Gaussian with nonzero mean must rotate ellipses about
        that mean — with mean ignored the moves would collapse toward 0."""
        from mfm_tpu.drivers.flow_smc import run_flow_smc

        d = 3
        mu = 6.0
        target = IndepGaussian(d, mean=mu, var=1.0)
        ref = IndepGaussian(d, mean=mu, var=4.0)  # ellipse prior about mu
        cfg = MFMConfig(dim=d, num_chain=256, alpha=0.8)
        r = run_flow_smc(
            target, cfg, _AffineTransport(1.0, 0.0), None, ref,
            key=key, n_steps=15, num_mcmc_steps=3, inner_kernel="tess",
        )
        assert float(r.lmbda) == 1.0
        np.testing.assert_allclose(
            np.asarray(r.samples).mean(0), mu, atol=0.3
        )
