"""Latent-space (pullback) view of a trained CNF as a Target.

The flow-annealed SMC sampler (drivers/flow_smc.py) tempers in the
*latent* space of the transport::

    rho_lambda(u)  ∝  q0(u) · exp(lambda · ell(u)),
    ell(u) = log pi(T(u)) + log|det dT/du|(u) − log q0(u)

so lambda = 0 is the flow reference q0 (exact sampler, exact density —
no inverse transport anywhere) and lambda = 1 is the exact pullback of
the target pi: pushing u ~ rho_1 through T yields pi samples. This slots
straight into the Target protocol the tempered-SMC machinery consumes —
``log_prior = log q0``, ``log_lik = ell`` — which is why annealing the
flow to the target needs no new SMC code (VERDICT r2 next-item 1; the
reference's final-IS block exe_flow_matching.py:453-459 is the
single-step lambda: 0 -> 1 special case of this path).

Divergence caveat: with a Hutchinson transport the log-det inside
``ell`` is a stochastic estimate. The probe key is FIXED per instance,
making each instance a well-defined deterministic surrogate density (so
MCMC acceptance ratios inside one tempering step are self-consistent);
the flow-SMC driver refreshes the probe key between tempering steps so
the surrogate family re-randomizes across the run. Exact-divergence
transports have no such caveat.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mfm_tpu.targets.base import Target


class FlowPullbackTarget(Target):
    """rho_1's (log_prior, log_lik) split over latent u for tempering.

    ``transport``/``params`` define T; ``ref_dist`` is q0; ``probe_key``
    feeds the Hutchinson probes (ignored by exact-divergence transports).
    """

    def __init__(
        self,
        target: Target,
        transport,
        params,
        ref_dist: Target,
        probe_key: Optional[jax.Array] = None,
    ):
        self.dim = target.dim
        self._target = target
        self._transport = transport
        self._params = params
        self._ref = ref_dist
        self._probe_key = probe_key

    # -- pieces ----------------------------------------------------------------
    def push_forward(self, u: jax.Array):
        """(x, logdet) of the batched transport at the instance probe key."""
        return self._transport.forward(self._params, u, self._probe_key)

    def _ell(self, u: jax.Array) -> jax.Array:
        x, logdet = self.push_forward(u)
        return self._target.log_prob(x) + logdet - self._ref.log_prob(u)

    # -- Target protocol (batched-first; single-sample via a width-1 batch,
    #    the transport is batch-only) ------------------------------------------
    def log_lik(self, u: jax.Array) -> jax.Array:
        if u.ndim == 1:
            return self._ell(u[None])[0]
        return self._ell(u)

    def log_prior(self, u: jax.Array) -> jax.Array:
        return self._ref.log_prob(u)

    def sample(self, key: jax.Array, shape=()):
        raise NotImplementedError("pullback target has no exact sampler")

    def init_positions(self, key: jax.Array, n_chain: int) -> jax.Array:
        """lambda = 0 exact draws: the flow reference itself."""
        return self._ref.sample(key, (n_chain,))

    def tempered_value_and_score(self, u: jax.Array, beta):
        """Fused batched value-and-grad of ``log q0 + beta * ell`` in ONE
        ODE solve + one reverse pass (the default vmapped autodiff would
        re-integrate the transport per sample)."""
        single = u.ndim == 1
        ub = u[None] if single else u

        def total(ub):
            x, logdet = self.push_forward(ub)
            vals = (1.0 - beta) * self._ref.log_prob(ub) + beta * (
                self._target.log_prob(x) + logdet
            )
            return jnp.sum(vals), vals

        grads, vals = jax.grad(total, has_aux=True)(ub)
        if single:
            return vals[0], grads[0]
        return vals, grads
