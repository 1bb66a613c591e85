"""Target density correctness: closed forms, batch/single consistency,
sampler moments, tempering split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.targets import (
    FlatDistribution,
    GaussianMixture,
    IndepGaussian,
    LogGaussianCoxPines,
    PhiFour,
    PhiFourBase,
    four_mode_mixture,
    random_mixture,
)


def _ref_mixture_logprob(x, modes, variances, weights):
    """Brute-force mixture log-density via per-component normal pdfs."""
    from scipy.stats import norm

    pdfs = np.array(
        [
            w * np.prod(norm.pdf(np.asarray(x), m, np.sqrt(v)))
            for m, v, w in zip(np.asarray(modes), np.asarray(variances), np.asarray(weights))
        ]
    )
    return np.log(pdfs.sum())


class TestIndepGaussian:
    def test_matches_scipy(self):
        from scipy.stats import norm

        d = IndepGaussian(3, mean=1.5, var=4.0)
        x = jnp.array([0.3, -1.2, 2.0])
        expected = norm.logpdf(np.asarray(x), 1.5, 2.0).sum()
        np.testing.assert_allclose(d.log_prob(x), expected, rtol=1e-5)

    def test_batch_equals_single(self, key):
        d = IndepGaussian(5)
        xs = jax.random.normal(key, (7, 5))
        batched = d.log_prob(xs)
        singles = jnp.stack([d.log_prob(x) for x in xs])
        np.testing.assert_allclose(batched, singles, rtol=1e-6)

    def test_sampler_moments(self, key):
        d = IndepGaussian(2, mean=3.0, var=0.25)
        xs = d.sample(key, (20000,))
        np.testing.assert_allclose(xs.mean(axis=0), 3.0, atol=0.02)
        np.testing.assert_allclose(xs.var(axis=0), 0.25, rtol=0.05)


class TestGaussianMixture:
    def test_matches_bruteforce(self):
        gm = four_mode_mixture()
        for x in [jnp.array([8.0, 8.0]), jnp.array([0.0, 0.0]), jnp.array([-3.0, 5.0])]:
            expected = _ref_mixture_logprob(x, gm.modes, gm.covs, gm.weights)
            np.testing.assert_allclose(gm.log_prob(x), expected, rtol=1e-4)

    def test_random_mixture_matches_bruteforce(self, key):
        gm = random_mixture()
        x = jnp.array([2.0, -4.0])
        expected = _ref_mixture_logprob(x, gm.modes, gm.covs, gm.weights)
        np.testing.assert_allclose(gm.log_prob(x), expected, rtol=1e-4)

    def test_logspace_stable_far_from_modes(self):
        gm = four_mode_mixture()
        x = jnp.array([60.0, 60.0])
        val = gm.log_prob(x)
        assert jnp.isfinite(val)  # naive pdf-space computation underflows to -inf

    def test_batch_equals_single(self, key):
        gm = random_mixture()
        xs = jax.random.normal(key, (11, 2)) * 5.0
        np.testing.assert_allclose(
            gm.log_prob(xs), jnp.stack([gm.log_prob(x) for x in xs]), rtol=1e-5
        )

    def test_sampler_mode_coverage(self, key):
        gm = four_mode_mixture()
        xs = gm.sample(key, (4000,))
        # each quadrant should hold ~25% of samples
        quadrant = (xs[:, 0] > 0).astype(int) * 2 + (xs[:, 1] > 0).astype(int)
        counts = jnp.bincount(quadrant, length=4) / xs.shape[0]
        np.testing.assert_allclose(counts, 0.25, atol=0.05)

    def test_score_finite(self, key):
        gm = four_mode_mixture()
        xs = jax.random.normal(key, (5, 2)) * 10
        assert jnp.all(jnp.isfinite(gm.score(xs)))


class TestPhiFour:
    def test_energy_bruteforce(self, key):
        d = 8
        pf = PhiFour(d)
        x = jax.random.normal(key, (d,))
        xn = np.asarray(x)
        # brute force: V + U with dirichlet padding
        coef = 0.1 * d
        v = np.sum((1 - xn**2) ** 2) / (4 * coef)
        xp = np.concatenate([[0.0], xn, [0.0]])
        u = coef * np.sum(np.diff(xp) ** 2) / 2
        np.testing.assert_allclose(pf.log_prob(x), -20.0 * (u + v), rtol=1e-5)

    def test_pbc_bruteforce(self, key):
        d = 6
        pf = PhiFour(d, bc=("pbc", 0.0))
        x = jax.random.normal(key, (d,))
        xn = np.asarray(x)
        coef = 0.1 * d
        v = np.sum((1 - xn**2) ** 2) / (4 * coef)
        xp = np.concatenate([[xn[-1]], xn])
        u = coef * np.sum(np.diff(xp) ** 2) / 2
        np.testing.assert_allclose(pf.log_prob(x), -20.0 * (u + v), rtol=1e-5)

    def test_tilt(self, key):
        d = 4
        pf = PhiFour(d, tilt={"val": 0.5, "lambda": 2.0})
        x = jax.random.normal(key, (d,))
        base = PhiFour(d)
        tilt_term = 2.0 * (0.5 - float(x.mean())) ** 2 / (4 * d)
        np.testing.assert_allclose(
            pf.log_prob(x), base.log_prob(x) - 20.0 * tilt_term, rtol=1e-5
        )

    def test_batch_equals_single(self, key):
        pf = PhiFour(16)
        xs = jax.random.normal(key, (9, 16))
        np.testing.assert_allclose(
            pf.log_prob(xs), jnp.stack([pf.log_prob(x) for x in xs]), rtol=1e-5
        )

    def test_two_wells(self):
        # with periodic boundary the uniform +1/-1 fields are the exact modes
        pf = PhiFour(32, bc=("pbc", 0.0))
        ones = jnp.ones(32)
        assert pf.log_prob(ones) > pf.log_prob(jnp.zeros(32))
        np.testing.assert_allclose(pf.log_prob(ones), pf.log_prob(-ones), rtol=1e-6)
        # Z2 symmetry holds under dirichlet too
        pfd = PhiFour(32)
        x = jnp.linspace(-1, 1, 32)
        np.testing.assert_allclose(pfd.log_prob(x), pfd.log_prob(-x), rtol=1e-5)


class TestPhiFourBase:
    def test_is_normalized_gaussian(self, key):
        d = 8
        base = PhiFourBase(d)
        # logprob must match scipy multivariate normal with cov = inv(prec)
        from scipy.stats import multivariate_normal

        cov = np.linalg.inv(np.asarray(base.prec, dtype=np.float64))
        x = np.asarray(jax.random.normal(key, (d,))) * 0.1
        expected = multivariate_normal.logpdf(x, np.zeros(d), cov)
        np.testing.assert_allclose(base.log_prob(jnp.asarray(x)), expected, rtol=1e-4)

    def test_sampler_covariance(self, key):
        d = 4
        base = PhiFourBase(d)
        xs = base.sample(key, (40000,))
        emp_cov = np.cov(np.asarray(xs).T)
        cov = np.linalg.inv(np.asarray(base.prec, dtype=np.float64))
        np.testing.assert_allclose(emp_cov, cov, atol=3e-3)


class TestLogGaussianCoxPines:
    @pytest.fixture(scope="class")
    def lgcp(self):
        return LogGaussianCoxPines(dim=64)  # 8x8 grid keeps CPU tests fast

    def test_counts_total(self, lgcp):
        # all 126 pines points must land in some bin
        assert float(lgcp._counts.sum()) == 126.0

    def test_prior_is_normalized_gaussian(self, lgcp, key):
        from scipy.stats import multivariate_normal

        chol = np.asarray(lgcp._chol, dtype=np.float64)
        cov = chol @ chol.T
        mean = float(lgcp._mu_zero) * np.ones(64)
        x = mean + 0.1 * np.asarray(jax.random.normal(key, (64,)))
        expected = multivariate_normal.logpdf(x, mean, cov)
        np.testing.assert_allclose(
            lgcp.log_prior(jnp.asarray(x, jnp.float32)), expected, rtol=1e-3
        )

    def test_whitened_consistency(self, key):
        """Whitened and unwhitened posteriors relate by the Cholesky pushforward."""
        unwhite = LogGaussianCoxPines(dim=64, whitened=False)
        white = LogGaussianCoxPines(dim=64, whitened=True)
        e = jax.random.normal(key, (64,)) * 0.5
        f = unwhite._unwhiten(e)
        # likelihoods agree when evaluated at corresponding points
        np.testing.assert_allclose(
            white.log_lik(e), unwhite.log_lik(f), rtol=1e-4
        )

    def test_batch_equals_single(self, lgcp, key):
        xs = lgcp.init_positions(key, 5)
        np.testing.assert_allclose(
            lgcp.log_prob(xs),
            jnp.stack([lgcp.log_prob(x) for x in xs]),
            rtol=2e-4,
        )

    def test_score_finite(self, lgcp, key):
        xs = lgcp.init_positions(key, 3)
        assert jnp.all(jnp.isfinite(lgcp.score(xs)))

    def test_analytic_score_matches_autodiff(self, lgcp, key):
        """The precision-GEMM fused score must equal autodiff of the
        solve-based density."""
        xs = lgcp.init_positions(key, 4)
        val, grad = lgcp.tempered_value_and_score(xs, 0.7)
        auto = jax.vmap(
            jax.value_and_grad(
                lambda x: 0.7 * lgcp.log_lik(x) + lgcp.log_prior(x)
            )
        )(xs)
        np.testing.assert_allclose(val, auto[0], rtol=2e-4)
        np.testing.assert_allclose(grad, auto[1], rtol=2e-3, atol=2e-2)

    def test_analytic_score_whitened(self, key):
        white = LogGaussianCoxPines(dim=64, whitened=True)
        xs = jax.random.normal(key, (4, 64))
        val, grad = white.tempered_value_and_score(xs, 1.0)
        auto = jax.vmap(jax.value_and_grad(white.log_prob))(xs)
        np.testing.assert_allclose(val, auto[0], rtol=2e-4)
        np.testing.assert_allclose(grad, auto[1], rtol=2e-3, atol=2e-2)


class TestTempering:
    def test_split(self, key):
        lg = LogGaussianCoxPines(dim=16)
        x = lg.init_positions(key, 2)
        np.testing.assert_allclose(
            lg.tempered_log_prob(x, 0.3),
            0.3 * lg.log_lik(x) + lg.log_prior(x),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            lg.tempered_log_prob(x, 1.0), lg.log_prob(x), rtol=1e-6
        )

    def test_flat(self):
        f = FlatDistribution(3)
        assert float(f.log_prob(jnp.ones(3))) == 0.0
