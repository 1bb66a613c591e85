"""Checkpoint / resume via orbax, single- or multi-process.

New capability relative to the reference, which persists nothing but wandb
logs (SURVEY.md section 5: "Checkpoint / resume: none in the main path").
The scan-chunked driver makes this trivial: the whole run state is one
pytree (chain ensemble, flow train state, tempering level, iteration).

Multi-process (multi-controller) runs save the *sharded* carry directly:
orbax writes each process's addressable shards and barriers via
jax.distributed, and restore rebuilds distributed arrays against the
template's shardings — so a pod-scale training run resumes without any
host ever holding the full chain ensemble. Every process must call
save/restore collectively (the driver does: the calls sit on the
every-controller path of run_mfm's chunk loop).
"""

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any):
    """Save a pytree under directory/step_<n>.

    ``state`` may contain sharded / multi-process jax.Arrays; they are
    saved as-is (no device_get), each process contributing its shards.
    """
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
    provides structure/dtypes AND shardings: each leaf restores with the
    template leaf's sharding, so a carry sharded over a (multi-process)
    mesh comes back as the same distributed array layout."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        restored = checkpointer.restore(
            path, item=template, restore_args=restore_args
        )
    else:
        restored = checkpointer.restore(path)
    return restored, step
