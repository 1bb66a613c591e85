"""Particle resampling schemes with static shapes.

Parity with the reference suite (/root/reference/bblackjax/smc/resampling.py):
systematic, stratified, multinomial (sorted-uniform + searchsorted), and
residual with a sink-state trick that keeps shapes static under jit.

All schemes reduce to a weight cumsum + ``searchsorted`` — XLA lowers both
to parallel-friendly primitives. The distributed variant (weights sharded
over a chains axis) works unchanged under jit: XLA inserts the gather for
the global cumsum (SURVEY.md section 2.8 calls this the one genuinely
distributed-hard op).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def _offset_resample(rng_key, weights, num_samples: int, systematic: bool):
    n = weights.shape[0]
    if systematic:
        u = jax.random.uniform(rng_key, ())
    else:
        u = jax.random.uniform(rng_key, (num_samples,))
    cum = jnp.cumsum(weights)
    grid = (jnp.arange(num_samples, dtype=weights.dtype) + u) / num_samples
    return jnp.clip(jnp.searchsorted(cum, grid), 0, n - 1)


def systematic(rng_key, weights, num_samples: int):
    """Single shared uniform offset; lowest-variance O(n) scheme."""
    return _offset_resample(rng_key, weights, num_samples, True)


def stratified(rng_key, weights, num_samples: int):
    """One uniform offset per stratum."""
    return _offset_resample(rng_key, weights, num_samples, False)


def _sorted_uniforms(rng_key, n: int):
    """n sorted U(0,1) draws via normalized exponential spacings (avoids an
    O(n log n) sort; same device-friendly trick as the reference :139-142)."""
    z = jnp.cumsum(-jnp.log(jax.random.uniform(rng_key, (n + 1,))))
    return z[:-1] / z[-1]


def multinomial(rng_key, weights, num_samples: int):
    """IID categorical resampling (highest variance; kept for parity)."""
    n = weights.shape[0]
    cum = jnp.cumsum(weights)
    u = _sorted_uniforms(rng_key, num_samples)
    return jnp.clip(jnp.searchsorted(cum, u), 0, n - 1)


def residual(rng_key, weights, num_samples: int):
    """Deterministic floor part + multinomial residuals.

    Static-shape formulation: the deterministic replications are produced by
    ``jnp.repeat(..., total_repeat_length)`` with index n as a sink state for
    the slots the multinomial part will overwrite (reference :96-121).
    """
    key_res, key_perm = jax.random.split(rng_key)
    n = weights.shape[0]
    scaled = num_samples * weights
    floor = jnp.floor(scaled).astype(jnp.int32)
    n_det = jnp.sum(floor)

    resid = scaled - floor
    resid_idx = multinomial(key_res, resid / jnp.maximum(resid.sum(), 1e-30), num_samples)
    # exchangeability: decouple residual draws from slot order
    resid_idx = jax.random.permutation(key_perm, resid_idx)

    det_idx = jnp.repeat(
        jnp.arange(n + 1),
        jnp.concatenate([floor, (num_samples - n_det)[None]]),
        total_repeat_length=num_samples,
    )
    slots = jnp.arange(num_samples)
    return jnp.where(slots < n_det, det_idx, resid_idx)


RESAMPLERS = {
    "systematic": systematic,
    "stratified": stratified,
    "multinomial": multinomial,
    "residual": residual,
}


def get_resampler(name: str) -> Callable:
    try:
        return RESAMPLERS[name]
    except KeyError:
        raise ValueError(f"unknown resampler {name!r}") from None
