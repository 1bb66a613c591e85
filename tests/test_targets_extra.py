"""Funnel / many-well targets, proposal algebra, YAML config loading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import from_yaml
from mfm_tpu.kernels import proposal
from mfm_tpu.targets import Funnel, ManyWell


class TestFunnel:
    def test_logprob_closed_form(self, key):
        from scipy.stats import norm

        f = Funnel(dim=4)
        x = np.asarray(jax.random.normal(key, (4,)))
        v = x[-1]
        expected = norm.logpdf(v, 0, 3.0) + norm.logpdf(
            x[:-1], 0, np.exp(0.5 * v)
        ).sum()
        np.testing.assert_allclose(f.log_prob(jnp.asarray(x)), expected, rtol=1e-4)

    def test_sampler_matches_density_moments(self, key):
        f = Funnel(dim=3)
        xs = f.sample(key, (100000,))
        np.testing.assert_allclose(np.asarray(xs[:, -1]).std(), 3.0, rtol=0.02)
        np.testing.assert_allclose(np.asarray(xs).mean(axis=0), 0.0, atol=0.15)

    def test_batch_equals_single(self, key):
        f = Funnel(dim=5)
        xs = jax.random.normal(key, (7, 5))
        np.testing.assert_allclose(
            f.log_prob(xs), jnp.stack([f.log_prob(x) for x in xs]), rtol=1e-5
        )


class TestManyWell:
    def test_pair_structure(self, key):
        mw = ManyWell(dim=4)
        x = jax.random.normal(key, (4,))
        x1a, x2a, x1b, x2b = [float(v) for v in x]
        expected = (
            -(x1a**4) + 6 * x1a**2 + 0.5 * x1a - 0.5 * x2a**2
            - (x1b**4) + 6 * x1b**2 + 0.5 * x1b - 0.5 * x2b**2
        )
        np.testing.assert_allclose(float(mw.log_prob(x)), expected, rtol=1e-4)

    def test_modes_are_symmetric_wells(self):
        mw = ManyWell(dim=2)
        # wells near x1 = +/- sqrt(3); the +well is slightly deeper (the
        # + x1/2 tilt)
        plus = mw.log_prob(jnp.array([1.7, 0.0]))
        minus = mw.log_prob(jnp.array([-1.7, 0.0]))
        mid = mw.log_prob(jnp.array([0.0, 0.0]))
        assert plus > minus > mid

    def test_batch(self, key):
        mw = ManyWell(dim=8)
        xs = jax.random.normal(key, (5, 8))
        assert mw.log_prob(xs).shape == (5,)


class TestProposalAlgebra:
    def _mk(self, weights):
        n = len(weights)
        state = {"x": jnp.arange(n, dtype=jnp.float32)}
        w = jnp.asarray(weights)
        return proposal.Proposal(state, jnp.zeros(n), w, jnp.minimum(w, 0.0))

    def test_static_binomial_batched(self, key):
        old = self._mk([0.0, 0.0, 0.0])
        new = proposal.Proposal(
            {"x": jnp.array([10.0, 11.0, 12.0])},
            jnp.zeros(3),
            jnp.array([100.0, -100.0, 0.0]),  # accept, reject, always-accept
            jnp.zeros(3),
        )
        out, accept, p = proposal.static_binomial_sampling(key, old, new)
        assert bool(accept[0]) and not bool(accept[1]) and bool(accept[2])
        np.testing.assert_allclose(np.asarray(p), [1.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.state["x"]), [10.0, 1.0, 12.0]
        )

    def test_progressive_accumulates_weight(self, key):
        a = self._mk([0.0, 0.0])
        b = self._mk([0.0, 0.0])
        out = proposal.progressive_uniform_sampling(key, a, b)
        np.testing.assert_allclose(np.asarray(out.weight), np.log(2.0), rtol=1e-5)

    def test_nonreversible_slice(self):
        old = self._mk([0.0])
        new = proposal.Proposal(
            {"x": jnp.array([5.0])}, jnp.zeros(1), jnp.array([1.0]), jnp.zeros(1)
        )
        out, accept, slice_var = proposal.nonreversible_slice_sampling(
            jnp.array([0.5]), old, new
        )
        assert bool(accept[0])  # log(0.5) < 1.0
        np.testing.assert_allclose(
            np.asarray(slice_var), 0.5 * np.exp(-1.0), rtol=1e-5
        )

    def test_asymmetric_generator_matches_mala_math(self, key):
        """Composing the asymmetric generator reproduces the inline MALA
        acceptance."""
        from mfm_tpu.kernels import mala
        from mfm_tpu.targets import IndepGaussian

        target = IndepGaussian(2)
        vs = lambda x: target.value_and_score(x)
        state = mala.init(jax.random.normal(key, (16, 2)), vs)
        kernel = mala.build_kernel(vs)
        _, info = kernel(key, state, 0.5)

        def trans_energy(a, b, step_size):
            theta = b.position - a.position - step_size * a.logdensity_grad
            return -a.logdensity + 0.25 / step_size * jnp.sum(theta * theta, -1)

        new, update = proposal.asymmetric_proposal_generator(trans_energy, jnp.inf)
        prop_state = mala.init(info.proposed_position, vs)
        prop, _ = update(state, prop_state, step_size=0.5)
        np.testing.assert_allclose(
            np.asarray(jnp.clip(jnp.exp(prop.weight), max=1.0)),
            np.asarray(info.acceptance_rate),
            rtol=1e-4,
        )


class TestYamlConfig:
    def test_load_with_include_and_preset(self, tmp_path):
        cfg = from_yaml("configs/phi_four.yaml")
        assert cfg.dim == 64 and cfg.num_chain == 1024  # preset applied
        assert cfg.mcmc_per_flow_steps == 100  # file field
        assert cfg.chunk_size == 100  # included base field

    def test_override_kwargs_win(self):
        cfg = from_yaml("configs/four_mode.yaml", learning_iter=5)
        assert cfg.learning_iter == 5

    def test_unknown_field_raises(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("nonsense_field: 3\n")
        with pytest.raises(ValueError):
            from_yaml(str(bad))


class TestPriorReference:
    def test_lgcp_prior_reference(self, key):
        from mfm_tpu.targets import LogGaussianCoxPines
        from mfm_tpu.targets.base import PriorReference

        lg = LogGaussianCoxPines(dim=64)
        ref = PriorReference(lg)
        xs = ref.sample(key, (2000,))
        # sampler matches the declared density: prior logprob of samples is
        # finite and the empirical mean is near mu_zero
        assert np.isfinite(np.asarray(ref.log_prob(xs))).all()
        np.testing.assert_allclose(
            float(np.asarray(xs).mean()), float(lg._mu_zero), atol=0.3
        )
        # density equals the target's log_prior exactly
        np.testing.assert_allclose(
            np.asarray(ref.log_prob(xs[:4])), np.asarray(lg.log_prior(xs[:4])),
            rtol=1e-5,
        )

    def test_unavailable_prior_raises(self, key):
        from mfm_tpu.targets import PhiFour
        from mfm_tpu.targets.base import PriorReference

        ref = PriorReference(PhiFour(8))
        with pytest.raises(NotImplementedError):
            ref.sample(key, (2,))


class TestManyWellSampler:
    def test_inverse_cdf_matches_quadrature(self, key):
        """Exact x1-marginal sampler: moments + mode weight vs quadrature."""
        mw = ManyWell(dim=8)
        s = mw.sample(key, (30000,))
        assert s.shape == (30000, 8)
        pairs = np.asarray(s).reshape(-1, 4, 2)
        x1, x2 = pairs[..., 0].ravel(), pairs[..., 1].ravel()

        g = np.linspace(-3.5, 3.5, 100001)
        lp = -(g**4) + 6 * g**2 + 0.5 * g
        p = np.exp(lp - lp.max())
        p /= np.trapezoid(p, g)
        m1 = np.trapezoid(g * p, g)
        m2 = np.trapezoid(g * g * p, g)
        p_pos = np.trapezoid(p[g > 0], g[g > 0])

        np.testing.assert_allclose(x1.mean(), m1, atol=0.02)
        np.testing.assert_allclose(x1.var(), m2 - m1**2, rtol=0.03)
        np.testing.assert_allclose((x1 > 0).mean(), p_pos, atol=0.01)
        np.testing.assert_allclose(x2.mean(), 0.0, atol=0.02)
        np.testing.assert_allclose(x2.var(), 1.0, rtol=0.03)

    def test_can_sample(self):
        assert ManyWell(4).can_sample
        assert Funnel(4).can_sample


class TestNewExamplePresets:
    def test_funnel_preset_clips_score(self):
        from mfm_tpu.config import preset

        cfg = preset("funnel")
        assert cfg.dim == 10
        # the funnel score explodes in the neck at any dim; the preset must
        # force the score-gate clip despite dim <= 128
        assert cfg.score_clip is not None

    def test_clip_score_override(self):
        from mfm_tpu.config import MFMConfig

        assert MFMConfig(dim=10).score_clip is None          # reference rule
        assert MFMConfig(dim=1600).score_clip is not None    # reference rule
        assert MFMConfig(dim=10, clip_score=True).score_clip is not None
        assert MFMConfig(dim=1600, clip_score=False).score_clip is None

    def test_many_well_preset(self):
        from mfm_tpu.config import preset

        cfg = preset("many-well")
        assert cfg.dim == 32 and cfg.dim % 2 == 0
