"""Scanned, NaN-guarded optimizer loop shared by the adaptation algorithms.

Parity with the reference ``optimize`` helper
(/root/reference/bblackjax/adaptation/atess.py:136-158): n_iter optax steps
under ``lax.scan``; a step whose loss or gradients are non-finite is skipped
(parameters and optimizer state carried through unchanged, loss reported as
NaN).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def optimize(
    params,
    opt_state,
    loss_fn: Callable,
    optimizer,
    n_iter: int,
    positions=None,
    key: Optional[jax.Array] = None,
):
    """Run n_iter steps of ``optimizer`` on ``loss_fn``.

    loss_fn(params, positions) when ``positions`` is given, else
    loss_fn(params, key) driven by per-step subkeys.
    Returns ((params, opt_state), per-step losses).
    """

    def step(carry, x):
        p, s = carry
        if positions is not None:
            loss, grads = jax.value_and_grad(loss_fn)(p, positions)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p, x)
        import optax

        updates, s_new = optimizer.update(grads, s, p)
        p_new = optax.apply_updates(p, updates)
        flat = jax.flatten_util.ravel_pytree(grads)[0]
        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(flat))
        guard = lambda new, old: jnp.where(ok, new, old)
        p_out = jax.tree_util.tree_map(guard, p_new, p)
        s_out = jax.tree_util.tree_map(guard, s_new, s)
        return (p_out, s_out), jnp.where(ok, loss, jnp.nan)

    xs = jnp.arange(n_iter) if key is None else jax.random.split(key, n_iter)
    return jax.lax.scan(step, (params, opt_state), xs)
