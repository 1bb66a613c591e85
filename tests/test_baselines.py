"""External-baseline wiring, proven with a stub package.

VERDICT r1 item 10: the flowMC/FAB/DDS packages are absent here and in the
reference environment, so the adapters stay gated — but the dispatch, the
BaselineResult schema, log-space IS re-weighting, and the CLI row
production must be demonstrably correct so wiring the real packages in is
mechanical. A fake ``flowMC`` module injected into sys.modules exercises
the full adapter path end to end (reference anchor: exe_others.py:114-199).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import MFMConfig
from mfm_tpu.drivers.baselines import (
    BASELINES,
    BaselineResult,
    available,
    is_resample,
    run_baseline,
)
from mfm_tpu.targets import four_mode_mixture


class TestGating:
    def test_external_packages_absent(self):
        """Honest gating: none of the baseline packages exist here (same as
        the reference environment), so dispatch must raise ImportError with
        an actionable message."""
        target = four_mode_mixture()
        cfg = MFMConfig(dim=2, num_chain=8, learning_iter=4)
        for name, (package, _) in BASELINES.items():
            if available(package):
                continue  # environment gained the package: adapter runs live
            with pytest.raises(ImportError, match=package):
                run_baseline(name, target, cfg)

    def test_unknown_baseline(self):
        with pytest.raises(ValueError, match="unknown baseline"):
            run_baseline("nuts4lyfe", four_mode_mixture(), MFMConfig())


class TestISResample:
    def test_log_space_matches_linear_weights(self, key):
        """Resampled frequencies must follow the normalized weights."""
        samples = jnp.arange(4.0)[:, None] * jnp.ones((4, 2))
        log_target = jnp.log(jnp.array([0.7, 0.1, 0.1, 0.1]))
        log_flow = jnp.zeros(4) - jnp.log(4.0)
        big = jnp.tile(samples, (2500, 1))
        exact, log_w = is_resample(
            key, big, jnp.tile(log_target, 2500), jnp.tile(log_flow, 2500)
        )
        frac_mode0 = float((exact[:, 0] == 0.0).mean())
        assert abs(frac_mode0 - 0.7) < 0.03
        assert jnp.isfinite(log_w).all()

    def test_nan_weights_never_selected(self, key):
        samples = jnp.stack([jnp.zeros(2), jnp.ones(2)])
        exact, _ = is_resample(
            key, samples, jnp.array([jnp.nan, 0.0]), jnp.zeros(2)
        )
        assert (exact == 1.0).all()


def _install_stub_flowmc(monkeypatch, dim):
    """Minimal fake of the flowMC API surface the adapter touches."""

    class FakeSpline:
        def __init__(self, *a, **k):
            pass

    class FakeMALA:
        def __init__(self, logprob, jit, params):
            self.logprob = logprob
            self.params = params

    class FakeSampler:
        def __init__(self, n_dim, rng_key, data, local_sampler, model, **kwargs):
            self.n_dim = n_dim
            self.kwargs = kwargs
            self._key = jax.random.PRNGKey(7)

        def sample(self, init_positions, data):
            assert init_positions.shape[-1] == self.n_dim
            self._trained = True

        def sample_flow(self, n):
            return jax.random.normal(self._key, (n, self.n_dim))

        def evalulate_flow(self, x):  # [sic] flowMC spells it this way
            return -0.5 * jnp.sum(x * x, -1)

        def get_sampler_state(self, training):
            return {"local_accs": np.ones((2, 3)), "loss_vals": np.zeros((2, 3))}

    mods = {
        "flowMC": types.ModuleType("flowMC"),
        "flowMC.nfmodel": types.ModuleType("flowMC.nfmodel"),
        "flowMC.nfmodel.rqSpline": types.ModuleType("flowMC.nfmodel.rqSpline"),
        "flowMC.sampler": types.ModuleType("flowMC.sampler"),
        "flowMC.sampler.MALA": types.ModuleType("flowMC.sampler.MALA"),
        "flowMC.sampler.Sampler": types.ModuleType("flowMC.sampler.Sampler"),
    }
    mods["flowMC.nfmodel.rqSpline"].MaskedCouplingRQSpline = FakeSpline
    mods["flowMC.sampler.MALA"].MALA = FakeMALA
    mods["flowMC.sampler.Sampler"].Sampler = FakeSampler
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)


class TestStubFlowMC:
    def test_adapter_end_to_end(self, monkeypatch, key):
        """With the API surface present, the adapter must produce a
        well-formed BaselineResult whose samples feed the shared
        comparison-row evaluation."""
        target = four_mode_mixture()
        cfg = MFMConfig(
            example="4-mode", dim=2, num_chain=16, learning_iter=8,
            eval_iter=4, mcmc_per_flow_steps=2.0,
        )
        _install_stub_flowmc(monkeypatch, cfg.dim)
        result = run_baseline("flowmc", target, cfg, seed=0)
        assert isinstance(result, BaselineResult)
        n_eval = cfg.eval_iter * cfg.num_chain
        assert result.flow_samples.shape == (n_eval, cfg.dim)
        assert result.exact_samples.shape == (n_eval, cfg.dim)
        assert result.train_time >= 0.0
        assert "local_accs" in result.extras

        # the shared comparison-row schema (cli.run_one)
        from mfm_tpu.drivers import evaluate_samples

        real = target.sample(key, (n_eval,))
        m = evaluate_samples(
            target, result.flow_samples, result.exact_samples, real
        )
        for col in ("logpdf", "stein_u", "stein_v", "mmd",
                    "logpdf_star", "stein_u_star", "stein_v_star", "mmd_star"):
            assert np.isfinite(m[col]), col

    @pytest.mark.slow
    def test_cli_row_via_stub(self, monkeypatch, tmp_path):
        """--do-flowmc end to end through the CLI with the stub installed."""
        _install_stub_flowmc(monkeypatch, 2)
        from mfm_tpu import cli

        cli.main([
            "--example", "4-mode", "--seed", "0", "--do-flowmc",
            "--learning-iter", "8", "--num-chain", "16",
            "--run-dir", str(tmp_path),
        ])
