"""Checkpoint / resume via orbax.

New capability relative to the reference, which persists nothing but wandb
logs (SURVEY.md section 5: "Checkpoint / resume: none in the main path").
The scan-chunked driver makes this trivial: the whole run state is one
pytree (chain ensemble, flow train state, tempering level, iteration).
"""

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any):
    """Save a pytree under directory/step_<n>."""
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(directory)
        if name.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Any = None):
    """Restore the pytree saved at ``step`` (default: latest). ``template``
    provides structure/dtypes so arrays restore as jax arrays."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        restored = checkpointer.restore(path, item=template)
    else:
        restored = checkpointer.restore(path)
    return restored, step
