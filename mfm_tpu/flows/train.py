"""Optimizer / train-state factory for the flow-matching model.

Parity with the reference training setup
(/root/reference/exe_flow_matching.py:93-198):

- AdamW with a weight-decay mask excluding biases and LayerNorm-like scales
  (:116-136)
- gradient clipping chained after AdamW, with a finite-guard as the NaN
  defense (reference wraps in ``optax.apply_if_finite(..., 10)``,
  :137,:184 — here re-implemented as fused selects, see ``finite_guard``)
- linear warmup -> linear decay-to-zero LR schedule (:189-198)

The train step itself lives in the drivers; this module only builds pure
optimizer state so it can be carried through ``lax.scan``.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


class TrainState(NamedTuple):
    """Minimal pure-pytree train state (scan-friendly)."""

    step: jax.Array
    params: dict
    opt_state: optax.OptState


def decay_mask(params) -> dict:
    """True for parameters that should be weight-decayed: everything except
    biases and *norm scales (reference decay_mask_fn, :116-127)."""
    flat = traverse_util.flatten_dict(params)

    def keep(path):
        name = path[-1]
        if name == "bias":
            return False
        joined = "".join(str(p) for p in path).lower()
        return not any(tag in joined for tag in ("layernorm", "layer_norm", "ln"))

    return traverse_util.unflatten_dict({p: keep(p) for p in flat})


def make_lr_schedule(
    num_train_steps: int, num_warmup_steps: int, learning_rate: float
) -> optax.Schedule:
    """Linear warmup then linear decay to zero (reference :189-198)."""
    warmup = optax.linear_schedule(0.0, learning_rate, max(num_warmup_steps, 1))
    decay = optax.linear_schedule(
        learning_rate, 0.0, max(num_train_steps - num_warmup_steps, 1)
    )
    return optax.join_schedules([warmup, decay], [num_warmup_steps])


class FiniteGuardState(NamedTuple):
    notfinite_count: jax.Array
    inner_state: optax.OptState


def finite_guard(
    inner: optax.GradientTransformation, max_consecutive_errors: int
) -> optax.GradientTransformation:
    """Select-based replacement for ``optax.apply_if_finite``.

    Same semantics — skip the update and freeze the inner state when any
    gradient is non-finite; once ``max_consecutive_errors`` consecutive
    bad steps accumulate, pass updates through so the failure surfaces —
    but compiled as elementwise selects instead of an HLO ``conditional``.
    A TPU conditional cannot alias its operands across branches, so
    ``apply_if_finite``'s cond copies the whole inner optimizer state
    (~80 MB of AdamW moments for the pines-size field) through HBM every
    iteration: measured 0.33 ms/iter = 40% of the pines MFM training
    step. The selects here fuse into the AdamW update and remove that
    copy entirely (headline profiled in RESULTS.md round 3).
    """

    def init_fn(params):
        return FiniteGuardState(jnp.zeros((), jnp.int32), inner.init(params))

    def update_fn(updates, state, params=None):
        finite = jnp.all(
            jnp.stack([
                jnp.all(jnp.isfinite(g))
                for g in jax.tree_util.tree_leaves(updates)
            ])
        )
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        use = finite | (state.notfinite_count > max_consecutive_errors)
        guarded = jax.tree_util.tree_map(
            lambda u: jnp.where(use, u, jnp.zeros_like(u)), new_updates
        )
        inner_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(use, n, o), new_inner, state.inner_state
        )
        count = jnp.where(finite, 0, state.notfinite_count + 1)
        return guarded, FiniteGuardState(count, inner_state)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate_fn,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    gradient_clip: float = 1.0,
    nonfinite_patience: int = 10,
) -> optax.GradientTransformation:
    adamw = optax.adamw(
        learning_rate=learning_rate_fn,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    chain = optax.chain(adamw, optax.clip(gradient_clip))
    return finite_guard(chain, nonfinite_patience)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def apply_gradients(state: TrainState, grads, tx) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, opt_state)
