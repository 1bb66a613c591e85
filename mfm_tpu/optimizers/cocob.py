"""COCOB-Backprop: parameter-free coin-betting optimizer.

Implements Algorithm 2 of Orabona & Tommasi 2017 ("Training Deep Networks
without Learning Rates Through Coin Betting") as an
``optax.GradientTransformation`` — capability parity with the reference
optimizer (/root/reference/bblackjax/optimizers/cocob.py:18-88), used by
coin-SVGD.

Per coordinate, with gradient g and initial point w0:
    L   <- max(L, |g|)                  (observed gradient range)
    G   <- G + |g|                      (sum of absolute gradients)
    R   <- max(R - g (w - w0), 0)       (accumulated reward)
    C   <- C - g                        (sum of negative gradients)
    w   <- w0 + C / (L max(G + L, alpha L)) * (L + R)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class CocobState(NamedTuple):
    initial_params: optax.Params
    grad_sum: optax.Updates  # C: sum of -g
    range_: optax.Updates  # L
    abs_sum: optax.Updates  # G
    reward: optax.Updates  # R


def cocob(alpha: float = 100.0, eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return CocobState(
            initial_params=params,
            grad_sum=zeros,
            range_=jax.tree_util.tree_map(lambda p: jnp.full_like(p, eps), params),
            abs_sum=zeros,
            reward=zeros,
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("cocob requires params to be passed to update")
        range_ = jax.tree_util.tree_map(
            lambda L, g: jnp.maximum(L, jnp.abs(g)), state.range_, grads
        )
        abs_sum = jax.tree_util.tree_map(
            lambda G, g: G + jnp.abs(g), state.abs_sum, grads
        )
        reward = jax.tree_util.tree_map(
            lambda R, g, w, w0: jnp.maximum(R - g * (w - w0), 0.0),
            state.reward,
            grads,
            params,
            state.initial_params,
        )
        grad_sum = jax.tree_util.tree_map(
            lambda C, g: C - g, state.grad_sum, grads
        )
        # target point of the bet, expressed as an optax update (delta)
        updates = jax.tree_util.tree_map(
            lambda w, w0, C, L, G, R: (
                w0 + C / (L * jnp.maximum(G + L, alpha * L)) * (L + R) - w
            ),
            params,
            state.initial_params,
            grad_sum,
            range_,
            abs_sum,
            reward,
        )
        return updates, CocobState(
            state.initial_params, grad_sum, range_, abs_sum, reward
        )

    return optax.GradientTransformation(init_fn, update_fn)
