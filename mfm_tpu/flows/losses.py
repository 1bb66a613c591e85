"""(Conditional) flow-matching regression losses.

Parity with the reference losses (/root/reference/exe_flow_matching.py:139-179):

- ``fm_sample``       Lipman-style path to a standard-normal reference:
                      x_t = t x1 + (1 - (1 - sigma) t) eps,
                      u_t = x1 - (1 - sigma) eps
- ``cond_fm_sample``  conditional path between a draw x0 from a configurable
                      reference distribution and the data x1:
                      x_t = sigma eps + t x1 + (1 - t) x0,  u_t = x1 - x0
                      (the default, multi_modal.py:163)
- optional minibatch optimal-transport coupling of (x0, x1) pairs via an
  in-repo log-domain Sinkhorn (the reference gates this behind ott-jax,
  exe_flow_matching.py:156-165; here it is self-contained)
- the loss is the **sum** (not mean) of squared residuals over the batch
  (exe_flow_matching.py:178)

Everything is batch-first; the regression target and the field evaluation
are one (B, d) pass each.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class FMBatch(NamedTuple):
    times: jax.Array  # (B,)
    points: jax.Array  # (B, d) points on the interpolation path
    targets: jax.Array  # (B, d) target vector field values


def fm_sample(key: jax.Array, samples: jax.Array, sigma: float) -> FMBatch:
    """Non-conditional flow-matching path (reference flow_fn, :139-147)."""
    B, d = samples.shape
    key_t, key_eps = jax.random.split(key)
    t = jax.random.uniform(key_t, (B,), samples.dtype)
    eps = jax.random.normal(key_eps, (B, d), samples.dtype)
    sd = 1.0 - (1.0 - sigma) * t
    points = t[:, None] * samples + sd[:, None] * eps
    targets = samples - (1.0 - sigma) * eps
    return FMBatch(t, points, targets)


def sinkhorn_plan(
    cost: jax.Array, n_iters: int = 50, epsilon: Optional[float] = None
) -> jax.Array:
    """Entropic OT plan between two uniform marginals, log-domain Sinkhorn.

    Returns the (B, B) transport matrix. Fixed iteration count keeps the
    computation static for XLA.
    """
    B = cost.shape[0]
    if epsilon is None:
        epsilon = 0.05 * jnp.mean(cost) + 1e-8
    logK = -cost / epsilon
    logu = jnp.zeros(B, cost.dtype)
    logv = jnp.zeros(B, cost.dtype)
    log_marg = -jnp.log(B)

    def body(carry, _):
        logu, logv = carry
        logu = log_marg - jax.scipy.special.logsumexp(logK + logv[None, :], axis=1)
        logv = log_marg - jax.scipy.special.logsumexp(logK + logu[:, None], axis=0)
        return (logu, logv), None

    (logu, logv), _ = jax.lax.scan(body, (logu, logv), None, length=n_iters)
    return jnp.exp(logu[:, None] + logK + logv[None, :])


def ot_pair(key: jax.Array, samples: jax.Array, ref_samples: jax.Array):
    """Minibatch-OT coupling: resample (x1, x0) index pairs from the Sinkhorn
    plan (reference ot_cond_flow path, exe_flow_matching.py:156-165)."""
    B = samples.shape[0]
    diff = samples[:, None, :] - ref_samples[None, :, :]
    cost = jnp.sum(diff * diff, axis=-1)
    plan = sinkhorn_plan(cost)
    flat = jnp.clip(plan.reshape(-1), 1e-30)
    choice = jax.random.choice(key, B * B, (B,), p=flat / flat.sum())
    i, j = jnp.divmod(choice, B)
    return samples[i], ref_samples[j]


def cond_fm_sample(
    key: jax.Array,
    samples: jax.Array,
    ref_sampler: Callable,
    sigma: float,
    ot_coupling: bool = False,
) -> FMBatch:
    """Conditional flow-matching path (reference cond_flow_fn, :151-169).

    ``ref_sampler(key, shape)`` draws (B, d) reference points x0.
    """
    B, d = samples.shape
    key_t, key_ref, key_eps, key_ot = jax.random.split(key, 4)
    t = jax.random.uniform(key_t, (B,), samples.dtype)
    x0 = ref_sampler(key_ref, (B,))
    if ot_coupling:
        samples, x0 = ot_pair(key_ot, samples, x0)
    eps = jax.random.normal(key_eps, (B, d), samples.dtype)
    points = sigma * eps + t[:, None] * samples + (1.0 - t[:, None]) * x0
    targets = samples - x0
    return FMBatch(t, points, targets)


def flow_matching_loss(
    params,
    apply_fn: Callable,
    key: jax.Array,
    samples: jax.Array,
    sigma: float,
    ref_sampler: Optional[Callable] = None,
    conditional: bool = True,
    ot_coupling: bool = False,
) -> jax.Array:
    """Sum-of-squares FM regression loss (reference flow_matching_loss,
    exe_flow_matching.py:171-179), one batched field evaluation."""
    if conditional or ot_coupling:
        batch = cond_fm_sample(key, samples, ref_sampler, sigma, ot_coupling)
    else:
        batch = fm_sample(key, samples, sigma)
    pred = apply_fn(params, batch.points, batch.times)
    resid = pred - batch.targets
    return jnp.sum(resid * resid)
