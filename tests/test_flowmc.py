"""In-repo flowMC: NF-enhanced MCMC loop correctness + training.

Reference behavior: exe_others.py:114-199 (external ``flowMC`` package:
spline-coupling flow + MALA local sampler + flow-guided global moves);
drivers/flowmc.py is the in-repo implementation.
"""

import jax
import jax.numpy as jnp
import pytest

from mfm_tpu.drivers.flowmc import flowmc_baseline, run_flowmc
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


def test_shapes_and_finiteness():
    target = IndepGaussian(3, var=2.0)
    res = run_flowmc(target, seed=0, n_chain=16, n_loop=3,
                     n_local_steps=4, n_global_steps=2, n_epochs=2,
                     n_layers=2, hidden=(16,), step_size=0.3)
    assert res.positions.shape == (3, 16, 3)
    assert res.local_accept.shape == (3,)
    assert res.losses.shape == (3, 2)
    assert jnp.isfinite(res.positions).all()
    assert jnp.isfinite(res.losses).all()
    assert (res.local_accept > 0).all()  # MALA moves on a Gaussian


def test_global_moves_accept_under_identity_flow_on_matched_target():
    """With target == base N(0,1) and an untrained (identity-init) flow,
    the global independence-MH proposal IS the target, so every global
    move must be accepted (log-ratio == 0)."""
    target = IndepGaussian(4, var=1.0)
    res = run_flowmc(target, seed=0, n_chain=32, n_loop=2,
                     n_local_steps=1, n_global_steps=3, n_epochs=0,
                     n_layers=2, hidden=(16,), learning_rate=0.0)
    assert jnp.allclose(res.global_accept, 1.0)


@pytest.mark.slow
def test_flowmc_trains_toward_4mode():
    target = four_mode_mixture()
    res = run_flowmc(target, seed=0, n_chain=128, n_loop=30,
                     n_local_steps=10, n_global_steps=10, n_epochs=10,
                     step_size=0.2, learning_rate=2e-3,
                     n_layers=4, hidden=(64, 64), base_scale=4.0)
    # the trained flow's samples should land in the target's support
    x, lq = res.flow.sample_and_log_prob(res.params, jax.random.PRNGKey(5),
                                         2048)
    trained = float(target.log_prob(x).mean())
    x0 = 4.0 * jax.random.normal(jax.random.PRNGKey(5), (2048, 2))
    untrained = float(target.log_prob(x0).mean())
    assert trained > untrained + 1.0, (trained, untrained)
    # and the global kernel must be actually mixing by the end
    assert float(res.global_accept[-5:].mean()) > 0.1


@pytest.mark.slow
def test_flowmc_baseline_adapter_schema():
    from mfm_tpu.config import preset

    cfg = preset("4-mode", learning_iter=20, num_chain=64, eval_iter=2)
    target = four_mode_mixture()
    result = flowmc_baseline(target, cfg, seed=0)
    n_eval = cfg.eval_iter * cfg.num_chain
    assert result.flow_samples.shape == (n_eval, 2)
    assert result.exact_samples.shape == (n_eval, 2)
    assert result.train_time > 0
    assert jnp.isfinite(result.extras["log_z_is"])
    assert result.extras["local_accs"].shape == result.extras["global_accs"].shape
