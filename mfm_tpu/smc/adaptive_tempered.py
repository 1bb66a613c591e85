"""Adaptive tempered SMC: pick each tempering increment by solving for a
target ESS, then delegate to the tempered kernel.

Parity with /root/reference/bblackjax/smc/adaptive_tempered.py. Used by the
SMC baseline driver (reference exe_others.py:79-111).
"""

from typing import Callable

import jax
import jax.numpy as jnp

from mfm_tpu.kernels.base import SamplingAlgorithm
from mfm_tpu.smc import ess as smc_ess
from mfm_tpu.smc import solvers, tempered
from mfm_tpu.targets.base import Target


def build_kernel(
    target: Target,
    mcmc_kernel_builder: Callable,
    mcmc_init: Callable,
    resample_fn: Callable,
    target_ess: float,
    num_mcmc_steps: int = 10,
    root_solver: Callable = solvers.dichotomy,
    gather_fn=None,
    waste_free_p: int = 0,
) -> Callable:
    tempered_kernel = tempered.build_kernel(
        target, mcmc_kernel_builder, mcmc_init, resample_fn, num_mcmc_steps,
        gather_fn, waste_free_p,
    )

    def kernel(rng_key, state: tempered.TemperedSMCState, mcmc_params=None):
        max_delta = 1.0 - state.lmbda
        loglik = target.log_lik(state.particles)
        delta = smc_ess.ess_solver(loglik, target_ess, max_delta, root_solver)
        delta = jnp.clip(jnp.nan_to_num(delta), 0.0, max_delta)
        return tempered_kernel(rng_key, state, state.lmbda + delta, mcmc_params)

    return kernel


def adaptive_tempered_smc(
    target: Target,
    mcmc_kernel_builder: Callable,
    mcmc_init: Callable,
    resample_fn: Callable,
    target_ess: float,
    num_mcmc_steps: int = 10,
    root_solver: Callable = solvers.dichotomy,
    gather_fn=None,
    waste_free_p: int = 0,
) -> SamplingAlgorithm:
    kernel = build_kernel(
        target,
        mcmc_kernel_builder,
        mcmc_init,
        resample_fn,
        target_ess,
        num_mcmc_steps,
        root_solver,
        gather_fn,
        waste_free_p,
    )
    return SamplingAlgorithm(tempered.init, kernel)
