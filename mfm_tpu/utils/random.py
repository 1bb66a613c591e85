"""PRNG helpers.

The framework keeps the reference's key-splitting discipline (fresh subkeys
per chain per iteration) but generates per-chain keys with a single
``jax.random.split`` so resharding the chain axis does not change the stream.
"""

import jax


def split_batch(key, n: int):
    """Split ``key`` into ``n`` per-chain keys, shape (n, 2)."""
    return jax.random.split(key, n)


def fold_in_batch(key, ids):
    """Derive per-chain keys by folding chain ids into one key.

    Unlike :func:`split_batch` this is invariant to how the id array is
    sharded, which makes chain streams stable under repartitioning.
    """
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)
