"""Effective sample size of importance weights + the tempering root problem.

Parity with /root/reference/bblackjax/smc/ess.py: the log-ESS identity
``log ESS = 2 logsumexp(w) - logsumexp(2w)`` and the delta-solver that picks
the next tempering increment so the incremental weights hit a target ESS.
"""

from typing import Callable

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def log_ess(log_weights: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * logsumexp(log_weights) - logsumexp(2.0 * log_weights)


def ess(log_weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(log_ess(log_weights))


def ess_solver(
    loglik: jnp.ndarray,
    target_ess: float,
    max_delta: float,
    root_solver: Callable,
):
    """Find delta in [0, max_delta] with ESS(delta * loglik) = target_ess * N.

    ``loglik`` are per-particle log-likelihood values; incremental weights
    for a tempering move of size delta are ``delta * loglik`` (reference
    ess.py:47-89 — note the reference negates inside, matching its
    ``-delta * logprob`` convention; here weights are ``+delta * loglik``).
    """
    n = loglik.shape[0]
    target = jnp.log(n * target_ess)

    def fun(delta):
        lw = jnp.nan_to_num(delta * loglik)
        return log_ess(lw) - target

    return root_solver(fun, 0.0, 0.0, max_delta)
