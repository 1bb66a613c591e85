from mfm_tpu.parallel.mesh import (
    chain_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_chains,
)

__all__ = [
    "chain_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_chains",
]
