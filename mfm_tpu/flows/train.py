"""Optimizer / train-state factory for the flow-matching model.

Parity with the reference training setup
(/root/reference/exe_flow_matching.py:93-198):

- AdamW with a weight-decay mask excluding biases and LayerNorm-like scales
  (:116-136)
- gradient clipping chained after AdamW, wrapped in
  ``optax.apply_if_finite(..., 10)`` as the NaN defense (:137,:184)
- linear warmup -> linear decay-to-zero LR schedule (:189-198)

The train step itself lives in the drivers; this module only builds pure
optimizer state so it can be carried through ``lax.scan``.
"""

from typing import NamedTuple

import jax
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
    return optax.apply_if_finite(chain, nonfinite_patience)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def apply_gradients(state: TrainState, grads, tx) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, opt_state)
