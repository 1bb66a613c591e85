"""Tempered SMC over pi_lambda(x) ∝ exp(logprior + lambda * loglik).

Parity with /root/reference/bblackjax/smc/tempered.py. TPU-first redesign of
the inner move: the reference scans ``num_mcmc_steps`` of a scalar MCMC
kernel *per particle* under vmap (tempered.py:130-141); here the **ensemble
kernel steps the whole particle block**, so the inner loop is a scan of
batched (N, d) kernel applications — each one a fused batched
gradient + proposal + accept pass.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mfm_tpu.kernels.base import SamplingAlgorithm
from mfm_tpu.smc import base as smc_base
from mfm_tpu.targets.base import Target


class TemperedSMCState(NamedTuple):
    particles: jax.Array
    weights: jax.Array
    lmbda: jax.Array  # current inverse temperature in [0, 1]


def init(particles: jax.Array) -> TemperedSMCState:
    n = particles.shape[0]
    return TemperedSMCState(
        particles, jnp.full((n,), 1.0 / n, particles.dtype), jnp.zeros(())
    )


def build_kernel(
    target: Target,
    mcmc_kernel_builder: Callable,
    mcmc_init: Callable,
    resample_fn: Callable,
    num_mcmc_steps: int = 10,
    gather_fn=None,
) -> Callable:
    """Build the tempered SMC kernel.

    mcmc_kernel_builder(value_and_score) -> ensemble kernel
        kernel(key, chain_state) -> (chain_state, info)
    mcmc_init(positions, value_and_score) -> chain_state

    When the per-step call supplies ``mcmc_params`` (any pytree — e.g.
    a traced (step_size, inverse_mass) tuple from an in-loop adaptation
    carry), the builder is called as ``mcmc_kernel_builder(vs, mcmc_params)``
    so kernel hyperparameters can change across tempering steps without
    retracing (drivers/smc_run.py uses this for dual averaging).
    """

    def kernel(rng_key: jax.Array, state: TemperedSMCState, lmbda, mcmc_params=None):
        delta = lmbda - state.lmbda

        # batched value-and-grad of the tempered posterior at the *current*
        # lambda (the MCMC moves target pi_{lambda_prev}; reweighing bridges
        # to lambda, reference tempered.py:122-128). Delegates to the target,
        # which may provide an analytic/fused batched path (LGCP's
        # precision-GEMM score; the flow-pullback target's single-ODE-solve
        # value-and-grad) instead of the default vmapped autodiff.
        def vs(x):
            return target.tempered_value_and_score(x, state.lmbda)

        if mcmc_params is None:
            inner = mcmc_kernel_builder(vs)
        else:
            inner = mcmc_kernel_builder(vs, mcmc_params)

        def update_fn(key, particles):
            chain = mcmc_init(particles, vs)

            def body(carry, k):
                new, info = inner(k, carry)
                return new, info.acceptance_rate

            keys = jax.random.split(key, num_mcmc_steps)
            chain, acc = jax.lax.scan(body, chain, keys)
            return chain.position, acc

        def weigh_fn(particles):
            return delta * target.log_lik(particles)

        smc_state, info = smc_base.step(
            rng_key,
            smc_base.SMCState(state.particles, state.weights),
            update_fn,
            weigh_fn,
            resample_fn,
            gather_fn=gather_fn,
        )
        new_state = TemperedSMCState(
            smc_state.particles, smc_state.weights, state.lmbda + delta
        )
        return new_state, info

    return kernel


def tempered_smc(
    target: Target,
    mcmc_kernel_builder: Callable,
    mcmc_init: Callable,
    resample_fn: Callable,
    num_mcmc_steps: int = 10,
    gather_fn=None,
) -> SamplingAlgorithm:
    kernel = build_kernel(
        target, mcmc_kernel_builder, mcmc_init, resample_fn, num_mcmc_steps,
        gather_fn,
    )

    def step_fn(rng_key, state, lmbda, mcmc_params=None):
        return kernel(rng_key, state, lmbda, mcmc_params)

    return SamplingAlgorithm(init, step_fn)
