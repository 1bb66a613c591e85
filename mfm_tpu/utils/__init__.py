from mfm_tpu.utils.pytree import ravel_batch, tree_stack, pytree_size
from mfm_tpu.utils.random import split_batch, fold_in_batch

__all__ = [
    "ravel_batch",
    "tree_stack",
    "pytree_size",
    "split_batch",
    "fold_in_batch",
]
