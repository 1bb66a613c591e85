from mfm_tpu.utils.pytree import (
    gaussian_like,
    host_chunked_scan,
    linear_map,
    pytree_size,
    ravel_batch,
    tree_stack,
)
from mfm_tpu.utils.random import split_batch, fold_in_batch

__all__ = [
    "gaussian_like",
    "host_chunked_scan",
    "linear_map",
    "ravel_batch",
    "tree_stack",
    "pytree_size",
    "split_batch",
    "fold_in_batch",
]
