"""Stein variational gradient descent (SVGD) and coin-SVGD.

Capability parity with /root/reference/bblackjax/vi/svgd.py: RBF kernel with
median-heuristic bandwidth, optax-driven particle transport, and the
parameter-free coin-betting variant.

TPU-first redesign: the reference evaluates the Stein functional gradient
with nested per-particle vmaps of value_and_grad of the kernel (svgd.py:72-87).
For the RBF kernel the whole update has a closed matrix form —

    phi(p_j) = [ sum_i k_ij grad_i  +  (2 / l) sum_i (p_i - p_j) k_ij ] / N
             = [ K^T G + (2 / l) (K^T P - colsum(K) * P_j) ] / N

— three (N, N) x (N, d) GEMMs on the MXU, no autodiff through the kernel.
"""

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from mfm_tpu.kernels.base import SamplingAlgorithm
from mfm_tpu.optimizers import cocob

_HIGH = lax.Precision.HIGHEST


class SVGDState(NamedTuple):
    particles: jax.Array  # (N, d)
    kernel_parameters: Dict[str, Any]
    opt_state: Any


def rbf_kernel_matrix(particles: jax.Array, length_scale) -> jax.Array:
    """K_ij = exp(-||p_i - p_j||^2 / l) (the reference's convention,
    svgd.py:94-96: no factor 1/2)."""
    sq = jnp.sum(particles * particles, axis=-1)
    gram = jnp.dot(particles, particles.T, precision=_HIGH)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
    return jnp.exp(-d2 / length_scale)


def stein_functional_gradient(
    particles: jax.Array, grads: jax.Array, length_scale
) -> jax.Array:
    """The quantity the optimizer treats as a gradient: -phi(p) (descending
    it transports particles along the Stein direction; parity with the
    reference's sign convention, svgd.py:78)."""
    N = particles.shape[0]
    K = rbf_kernel_matrix(particles, length_scale)
    kg = jnp.dot(K.T, grads, precision=_HIGH)  # sum_i k_ij grad_i
    kp = jnp.dot(K.T, particles, precision=_HIGH)
    colsum = jnp.sum(K, axis=0)[:, None]
    # sum_i grad_{p_i} k(p_i, p_j) = -(2/l) (sum_i k_ij p_i - colsum_j p_j);
    # this is the repulsive term pushing particles apart
    grad_k = -(2.0 / length_scale) * (kp - colsum * particles)
    return -(kg + grad_k) / N


def median_heuristic(particles: jax.Array) -> jax.Array:
    """l = median(pairwise distance)^2 / log N (reference svgd.py:99-112)."""
    N = particles.shape[0]
    sq = jnp.sum(particles * particles, axis=-1)
    gram = jnp.dot(particles, particles.T, precision=_HIGH)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
    dist = jnp.sqrt(d2)
    tri = dist[jnp.tril_indices(N, k=-1)]
    med = jnp.median(tri)
    return (med**2) / jnp.log(N * 1.0)


def build_kernel(optimizer: optax.GradientTransformation) -> Callable:
    def kernel(
        state: SVGDState, grad_logdensity_fn: Callable, **grad_params
    ) -> SVGDState:
        particles, kernel_params, opt_state = state
        grads = grad_logdensity_fn(particles, **grad_params)  # (N, d) batched
        fg = stein_functional_gradient(
            particles, grads, kernel_params["length_scale"]
        )
        updates, opt_state = optimizer.update(fg, opt_state, particles)
        particles = optax.apply_updates(particles, updates)
        return SVGDState(particles, kernel_params, opt_state)

    return kernel


def update_median_heuristic(state: SVGDState) -> SVGDState:
    params = dict(state.kernel_parameters)
    params["length_scale"] = median_heuristic(state.particles)
    return SVGDState(state.particles, params, state.opt_state)


def _make(optimizer, grad_logdensity_fn, update_kernel_parameters):
    kernel = build_kernel(optimizer)

    def init_fn(initial_particles, kernel_parameters=None):
        if kernel_parameters is None:
            kernel_parameters = {"length_scale": jnp.ones(())}
        return SVGDState(
            initial_particles, kernel_parameters, optimizer.init(initial_particles)
        )

    def step_fn(state, **grad_params):
        state = kernel(state, grad_logdensity_fn, **grad_params)
        return update_kernel_parameters(state)

    return SamplingAlgorithm(init_fn, step_fn)


def svgd(
    grad_logdensity_fn: Callable,
    optimizer: optax.GradientTransformation,
    update_kernel_parameters: Callable = update_median_heuristic,
) -> SamplingAlgorithm:
    """SVGD with a batched score function (N, d) -> (N, d)."""
    return _make(optimizer, grad_logdensity_fn, update_kernel_parameters)


def coin_svgd(
    grad_logdensity_fn: Callable,
    update_kernel_parameters: Callable = update_median_heuristic,
    alpha: float = 100.0,
) -> SamplingAlgorithm:
    """SVGD driven by the parameter-free COCOB optimizer
    (reference svgd.py:171-216)."""
    return _make(cocob(alpha), grad_logdensity_fn, update_kernel_parameters)
