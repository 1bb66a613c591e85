"""ATESS: adaptive transport elliptical slice sampling warmup.

Parity with /root/reference/bblackjax/adaptation/atess.py: alternate TESS
ensemble moves with flow-parameter optimization on the chains' pullback
positions, in cross-chain or parallel-ECA mode, all inside one scanned run.

The flow argument is a batched callable ``flow(u, params) -> (x, logdet)``
with logdet = log|det dx/du| (e.g. a partial of
``mfm_tpu.flows.make_transport().forward``).
"""

from typing import Callable

import jax
import jax.numpy as jnp

from mfm_tpu.adaptation import chain_adaptation
from mfm_tpu.adaptation.optimize import optimize
from mfm_tpu.kernels import tess
from mfm_tpu.kernels.base import AdaptationAlgorithm


def base(
    kernel_factory: Callable,
    optimizer,
    loss_fn: Callable,
    num_batch: int,
    batch_size: int,
    n_opt_iter: int = 10,
    eca: bool = True,
    mesh=None,
):
    """Shared adaptation loop used by ATESS and MSC (reference atess.py:16-57)."""

    def parameter_gn(batch_state, step, params, opt_state):
        (params, opt_state), _ = optimize(
            params,
            opt_state,
            loss_fn,
            optimizer,
            n_opt_iter,
            positions=batch_state.position,
        )
        return params, opt_state

    if eca:
        init, update = chain_adaptation.parallel_eca(
            kernel_factory, parameter_gn, num_batch, batch_size, mesh=mesh
        )
    else:
        init, update = chain_adaptation.cross_chain(
            kernel_factory, parameter_gn, num_batch * batch_size
        )

    def final(last_state, param_state):
        if eca:
            return None, None
        params = parameter_gn(last_state.states, last_state.step, *param_state)
        return kernel_factory(*params), params[0]

    return init, update, final


def atess(
    logprob_fn: Callable,
    optimizer,
    init_params,
    flow: Callable,
    loss_fn: Callable,
    num_batch: int,
    batch_size: int,
    num_steps: int = 1000,
    n_opt_iter: int = 1,
    eca: bool = False,
    mesh=None,
) -> AdaptationAlgorithm:
    """Warmup returning (last_state, kernel, params).

    logprob_fn : batched target log-density (B, d) -> (B,)
    flow       : (u, params) -> (x, logdet), batched
    loss_fn    : (params, positions) -> scalar flow-fit loss
    """
    kernel = tess.build_kernel()

    def kernel_factory(params, opt_state):
        def kernel_fn(rng_key, state):
            return kernel(rng_key, state, logprob_fn, lambda u: flow(u, params))

        return kernel_fn

    init_adapt, update, final = base(
        kernel_factory, optimizer, loss_fn, num_batch, batch_size,
        n_opt_iter, eca, mesh,
    )

    if eca:
        # one parameter copy per ensemble batch
        params0 = jax.vmap(lambda _: (init_params, optimizer.init(init_params)))(
            jnp.zeros(num_batch)
        )
    else:
        params0 = (init_params, optimizer.init(init_params))

    def one_step(carry, rng_key):
        state, params = carry
        state, params, infos = update(rng_key, state, *params)
        return (state, params), infos

    def run(rng_key: jax.Array, pullback_positions: jax.Array):
        states = tess.init(pullback_positions)
        state0 = init_adapt(states)
        keys = jax.random.split(rng_key, num_steps)
        (last_state, params), infos = jax.lax.scan(
            one_step, (state0, params0), keys
        )
        kernel_fn, fitted = final(last_state, params)
        return last_state, kernel_fn, fitted if not eca else params

    return AdaptationAlgorithm(run)
