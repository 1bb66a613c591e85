"""Defensive-mixture IS correction (drivers.mfm.sample_flow_defensive_parts).

The estimator mixes the flow proposal with a wide defensive component,
q_mix = a*q_flow + (1-a)*q_def (Hesterberg 1995), bounding every
importance weight at pi/((1-a) q_def) — the repair for the finite-N logZ
tilt under heavy-tailed pullback weights isolated on many-well
(RESULTS.md round 5). No reference counterpart: the reference's final-IS
block (exe_flow_matching.py:453-459) is the pure-flow alpha=1 case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.drivers.mfm import sample_flow_defensive_parts, sample_flow_parts
from mfm_tpu.flows import make_transport
from mfm_tpu.targets import GaussianMixture, IndepGaussian


def _identity_transport():
    """Zero vector field => x = u, logdet = 0; exercises the real
    forward/inverse transport code with a known-exact flow density."""
    return make_transport(
        lambda params, x, t: jnp.zeros_like(x), divergence="exact", n_steps=4
    )


def _logz(log_w):
    return float(jax.nn.logsumexp(log_w) - jnp.log(log_w.shape[0]))


@pytest.fixture
def key():
    return jax.random.key(7)


class TestDefensiveIS:
    def test_tail_repair_on_missed_mode(self, key):
        """A proposal that misses a mode: pure-flow IS undershoots logZ by
        ~the missing mode's mass; the defensive mixture recovers it."""
        # target: equal-weight modes at 0 and at 6 (d=2); true logZ = 0
        target = GaussianMixture(
            modes=jnp.array([[0.0, 0.0], [6.0, 6.0]]),
            covs=0.25 * jnp.ones((2, 2)),
            weights=jnp.array([0.5, 0.5]),
        )
        transport = _identity_transport()
        ref = IndepGaussian(2, mean=0.0, var=0.25)  # covers mode A only
        wide = IndepGaussian(2, mean=3.0, var=25.0)  # covers both modes
        n = 4096

        _, _, log_w_pure = sample_flow_parts(
            transport, None, ref, key, n, target
        )
        _, _, log_w_def = sample_flow_defensive_parts(
            transport, None, ref, key, n, target, wide, alpha=0.5
        )
        # the proposal assigns ~zero mass to the mode at 6: pure IS sees
        # half the normalizer (logZ_hat ~ log 0.5 = -0.69) at any feasible N
        assert _logz(log_w_pure) < -0.5
        assert abs(_logz(log_w_def)) < 0.15
        assert bool(jnp.all(jnp.isfinite(log_w_def)))

    def test_consistent_when_flow_is_exact(self, key):
        """ref == target through an identity flow: logZ_hat ~ 0 for any
        alpha — the defensive component must not bias a good proposal."""
        target = IndepGaussian(3, mean=0.0, var=1.0)
        transport = _identity_transport()
        wide = IndepGaussian(3, mean=0.0, var=9.0)
        for alpha in (0.5, 0.9):
            _, _, log_w = sample_flow_defensive_parts(
                transport, None, target, key, 2048, target, wide, alpha=alpha
            )
            assert abs(_logz(log_w)) < 0.05, alpha

    def test_alpha_one_dispatches_to_pure_flow(self, key):
        target = IndepGaussian(2)
        transport = _identity_transport()
        wide = IndepGaussian(2, var=9.0)
        _, _, lw_def = sample_flow_defensive_parts(
            transport, None, target, key, 256, target, wide, alpha=1.0
        )
        _, _, lw_pure = sample_flow_parts(transport, None, target, key, 256, target)
        np.testing.assert_array_equal(np.asarray(lw_def), np.asarray(lw_pure))

    def test_weight_bound(self, key):
        """Every mixture weight obeys log w <= log pi - log((1-a) q_def)."""
        target = GaussianMixture()
        transport = _identity_transport()
        ref = IndepGaussian(2, var=0.25)
        wide = IndepGaussian(2, mean=2.5, var=25.0)
        alpha = 0.75
        x, _, log_w = sample_flow_defensive_parts(
            transport, None, ref, key, 512, target, wide, alpha=alpha
        )
        bound = (
            target.log_prob(x) - jnp.log1p(-alpha) - wide.log_prob(x)
        )
        assert bool(jnp.all(log_w <= bound + 1e-5))

    def test_alpha_validation(self, key):
        target = IndepGaussian(2)
        with pytest.raises(ValueError):
            sample_flow_defensive_parts(
                _identity_transport(), None, target, key, 64, target,
                IndepGaussian(2, var=4.0), alpha=0.0,
            )

    @pytest.mark.slow
    def test_cli_defensive_flag(self, tmp_path, capsys, monkeypatch):
        """--defensive-alpha routes the final IS through the mixture."""
        from mfm_tpu import cli

        monkeypatch.chdir(tmp_path)
        cli.main(
            [
                "--example", "4-mode", "--seed", "0",
                "--learning-iter", "20", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "20",
                "--run-dir", str(tmp_path / "runs"),
                "--defensive-alpha", "0.8", "--defensive-var", "25.0",
            ]
        )
        out = capsys.readouterr().out
        assert "logprob" in out and "\\pm" in out
