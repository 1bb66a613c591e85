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

# mfm_tpu.parallel.distributed (multi-process DCN seed replication) is NOT
# imported here: jax.distributed must initialize before any backend exists,
# so callers import it explicitly at process startup.
