"""Markovian score climbing (MSC) with the CIS kernel.

Parity with /root/reference/bblackjax/adaptation/msc.py: cross-chain
adaptation where each step refreshes chains with conditional importance
sampling through the current flow and then climbs the flow-fit objective on
the chain positions (or a stochastic objective driven by per-step keys).
"""

from typing import Callable, Optional

import jax

from mfm_tpu.adaptation import chain_adaptation
from mfm_tpu.adaptation.optimize import optimize
from mfm_tpu.kernels import cis
from mfm_tpu.kernels.base import AdaptationAlgorithm


def msc(
    logprob_fn: Callable,
    optimizer,
    init_params,
    flow: Callable,
    loss_fn: Callable,
    num_chain: int,
    num_steps: int = 1000,
    n_opt_iter: int = 1,
    num_importance_samples: int = 1,
    stochastic_loss: Optional[Callable] = None,
) -> AdaptationAlgorithm:
    """MSC warmup.

    flow(u, params) -> (x, logdet), batched.
    loss_fn(params, positions) -> scalar, or provide ``stochastic_loss``
    (positions -> (params, key) -> scalar) for the key-driven variant
    (reference msc.py:24-42).
    """
    kernel = cis.build_kernel(num_importance_samples)

    def kernel_factory(params, opt_state):
        def kernel_fn(rng_key, state):
            return kernel(rng_key, state, logprob_fn, lambda u: flow(u, params))

        return kernel_fn

    def parameter_gn(states, step, params, opt_state):
        if stochastic_loss is None:
            (params, opt_state), _ = optimize(
                params, opt_state, loss_fn, optimizer, n_opt_iter,
                positions=states.position,
            )
        else:
            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
            (params, opt_state), _ = optimize(
                params, opt_state, stochastic_loss(states.position), optimizer,
                n_opt_iter, key=key,
            )
        return params, opt_state

    init_adapt, update = chain_adaptation.cross_chain(
        kernel_factory, parameter_gn, num_chain
    )
    params0 = (init_params, optimizer.init(init_params))

    def one_step(carry, rng_key):
        state, params = carry
        state, params, infos = update(rng_key, state, *params)
        return (state, params), infos

    def run(rng_key: jax.Array, pullback_positions: jax.Array):
        state0 = init_adapt(cis.init(pullback_positions))
        keys = jax.random.split(rng_key, num_steps)
        (last_state, params), infos = jax.lax.scan(
            one_step, (state0, params0), keys
        )
        final_params = parameter_gn(last_state.states, last_state.step, *params)
        return last_state, kernel_factory(*final_params), final_params[0], infos

    return AdaptationAlgorithm(run)
