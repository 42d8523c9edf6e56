from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    setup_data_parallel,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "setup_data_parallel",
    "shard_batch",
]
