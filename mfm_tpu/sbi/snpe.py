"""Simulation-based inference scaffolding: simulator wrapper + SNPE-A.

Capability parity with the reference ``simulax`` package
(/root/reference/simulax/simulate.py:8-19, simulax/snpe/base.py:10-40,
simulax/snpe/snpe_a.py:9-24): a prior+likelihood simulator producing
(params, data) pairs and sequential neural posterior estimation whose loss
is the summed approximate log-posterior over vmapped simulations.
"""

import abc
from typing import Callable

import jax
import jax.numpy as jnp


def simulator(likelihood_gn: Callable) -> Callable:
    """Wrap prior and likelihood generators into a (params, data) sampler."""

    def simulate(rng_key, prior_gn: Callable, *prior_args, **prior_kwargs):
        key_prior, key_lik = jax.random.split(rng_key)
        params = prior_gn(key_prior, *prior_args, **prior_kwargs)
        data = likelihood_gn(key_lik, params)
        return params, data

    return simulate


class SNPE(metaclass=abc.ABCMeta):
    """Sequential neural posterior estimation base.

    ``approx_logprob_fn(approx_params, theta, data)`` scores the neural
    posterior approximation; the prior generator can be swapped between
    rounds (update_* methods) to implement the sequential scheme.
    """

    def __init__(
        self,
        approx_logprob_fn: Callable,
        num_obs: int,
        likelihood_gn: Callable,
        prior_gn: Callable,
        *prior_args,
        **prior_kwargs,
    ):
        self.approx_logprob_fn = approx_logprob_fn
        self.num_obs = num_obs
        self.simulate = simulator(likelihood_gn)
        self.prior_gn = prior_gn
        self.prior_args = prior_args
        self.prior_kwargs = prior_kwargs

    def update_prior_generator(self, prior_gn: Callable):
        self.prior_gn = prior_gn

    def update_prior_params(self, *prior_args, **prior_kwargs):
        self.prior_args = prior_args
        self.prior_kwargs = prior_kwargs

    def update_approx_logprob_function(self, approx_logprob_fn: Callable):
        self.approx_logprob_fn = approx_logprob_fn

    @abc.abstractmethod
    def get_loss_function(self, rng_key, num_particles: int) -> Callable:
        """Loss as a function of the approximation parameters."""


class SNPE_A(SNPE):
    """SNPE-A: maximize the summed approximate posterior log-density of
    vmapped (params, data) simulations."""

    def get_loss_function(self, rng_key, num_particles: int) -> Callable:
        keys = jax.random.split(rng_key, num_particles)
        thetas, datas = jax.vmap(
            lambda k: self.simulate(
                k, self.prior_gn, *self.prior_args, **self.prior_kwargs
            )
        )(keys)

        def loss(approx_params):
            logprobs = jax.vmap(
                lambda theta, data: self.approx_logprob_fn(
                    approx_params, theta, data
                )
            )(thetas, datas)
            return jnp.sum(logprobs)

        return loss
