"""Target-density protocol.

TPU-first counterpart of the reference ``Distribution`` ABC
(/root/reference/distributions.py:8-39). Differences by design:

- Targets are plain Python objects whose array state is fixed at
  construction; drivers close over them, so inside ``jit`` / ``shard_map``
  their arrays become trace-time constants (no pytree flattening needed —
  configuration such as dims/boundary conditions is static by construction).
- Every density is **batch-first**: ``log_prob(x)`` accepts ``(d,)`` or
  ``(B, d)`` and the batched path is written with large matmuls/elementwise
  ops that map onto the MXU/VPU, instead of relying on ``jax.vmap`` of a
  scalar-oriented function.
- The likelihood/prior split (``log_lik`` / ``log_prior``) is kept because
  tempering schedules interpolate ``beta * log_lik + log_prior``
  (reference exe_flow_matching.py:301).
"""

from typing import Optional

import jax
import jax.numpy as jnp


class Target:
    """Base class for unnormalized target densities.

    Subclasses implement the single-sample ``_log_lik`` / ``_log_prior``
    (signature ``(d,) -> scalar``) and may override the batched
    ``log_lik`` / ``log_prior`` with a fused implementation. ``log_prob``
    is always ``log_lik + log_prior``.
    """

    dim: int

    # ---- single-sample hooks -------------------------------------------------
    def _log_lik(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def _log_prior(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    # ---- batched API ---------------------------------------------------------
    def log_lik(self, x: jax.Array) -> jax.Array:
        """Log-likelihood term; ``(d,) -> ()`` or ``(B, d) -> (B,)``."""
        if x.ndim == 1:
            return self._log_lik(x)
        return jax.vmap(self._log_lik)(x)

    def log_prior(self, x: jax.Array) -> jax.Array:
        """Log-prior term; ``(d,) -> ()`` or ``(B, d) -> (B,)``."""
        if x.ndim == 1:
            return self._log_prior(x)
        return jax.vmap(self._log_prior)(x)

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Unnormalized log-density; ``(d,) -> ()`` or ``(B, d) -> (B,)``."""
        return self.log_lik(x) + self.log_prior(x)

    def score(self, x: jax.Array) -> jax.Array:
        """Gradient of ``log_prob``; same leading shape as ``x``."""
        single = lambda v: self.log_prob(v)
        if x.ndim == 1:
            return jax.grad(single)(x)
        return jax.vmap(jax.grad(single))(x)

    def value_and_score(self, x: jax.Array):
        """(log_prob, grad log_prob) in one pass; batched like ``score``."""
        single = jax.value_and_grad(lambda v: self.log_prob(v))
        if x.ndim == 1:
            return single(x)
        return jax.vmap(single)(x)

    # ---- sampling hooks ------------------------------------------------------
    def sample(self, key: jax.Array, shape=()) -> jax.Array:
        """Exact sampler when available. ``shape`` is the batch shape."""
        raise NotImplementedError(f"{type(self).__name__} has no exact sampler")

    @property
    def can_sample(self) -> bool:
        return type(self).sample is not Target.sample

    def init_positions(self, key: jax.Array, n_chain: int) -> jax.Array:
        """Initial chain positions, shape (n_chain, dim). Default: N(0, I)."""
        return jax.random.normal(key, (n_chain, self.dim))

    def prior_sample(self, key: jax.Array, shape=()) -> jax.Array:
        """Exact sampler of the (normalized) prior, when available. Enables
        the 'prior' flow reference distribution (prior -> posterior
        transport is much shorter than N(0,I) -> posterior for targets with
        structured priors like the LGCP)."""
        raise NotImplementedError(f"{type(self).__name__} has no prior sampler")

    # ---- tempering -----------------------------------------------------------
    def tempered_log_prob(self, x: jax.Array, beta) -> jax.Array:
        """``beta * log_lik + log_prior`` (reference exe_flow_matching.py:301)."""
        return beta * self.log_lik(x) + self.log_prior(x)

    def tempered_value_and_score(self, x: jax.Array, beta):
        """(tempered log-density, its gradient), batched. Targets with
        analytic scores override this to avoid autodiff (e.g. LGCP)."""
        single = jax.value_and_grad(lambda v: self.tempered_log_prob(v, beta))
        if x.ndim == 1:
            return single(x)
        return jax.vmap(single)(x)


def as_logprob_fn(target: Target, beta: Optional[jax.Array] = None):
    """Single-sample ``(d,) -> scalar`` closure, optionally tempered."""
    if beta is None:
        return lambda x: target.log_prob(jnp.atleast_1d(x))
    return lambda x: target.tempered_log_prob(jnp.atleast_1d(x), beta)


class PriorReference(Target):
    """Flow reference distribution wrapping a target's own prior.

    log_prob is the target's (normalized) log_prior; sample delegates to
    ``target.prior_sample``. New capability vs the reference's fixed
    ref-dist table (exe_flow_matching.py:48-54): with an informed prior the
    CNF only has to learn the likelihood update.
    """

    def __init__(self, target: Target):
        self.dim = target.dim
        self._target = target

    @property
    def gaussian_mean(self):
        """Mean of the (Gaussian) prior, for elliptical-slice proposals
        (drivers/flow_smc TESS inner kernel). Targets with a non-centered
        Gaussian prior expose ``prior_gaussian_mean``."""
        return getattr(self._target, "prior_gaussian_mean", 0.0)

    def log_lik(self, x):
        return self._target.log_prior(x)

    def log_prior(self, x):
        return jnp.zeros(x.shape[:-1], x.dtype)

    def sample(self, key, shape=()):
        return self._target.prior_sample(key, shape)
