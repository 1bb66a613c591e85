"""Small pytree helpers used across the framework."""

import jax
import jax.numpy as jnp


def pytree_size(tree) -> int:
    """Total number of scalar entries in a pytree."""
    return sum(jnp.size(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def ravel_batch(tree):
    """Flatten a pytree whose leaves share a leading batch axis to (B, D).

    Returns the flat (B, D) array and an ``unravel`` function mapping a
    (B, D) array back to the original structure.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    batch = leaves[0].shape[0]
    shapes = [leaf.shape[1:] for leaf in leaves]
    sizes = [int(jnp.prod(jnp.array(s))) if s else 1 for s in shapes]
    flat = jnp.concatenate([leaf.reshape(batch, -1) for leaf in leaves], axis=1)

    def unravel(arr):
        out, start = [], 0
        for shape, size in zip(shapes, sizes):
            chunk = arr[:, start : start + size]
            out.append(chunk.reshape((arr.shape[0],) + shape))
            start += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unravel


def tree_stack(trees):
    """Stack a list of identical-structure pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
