from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    setup_data_parallel,
    shard_batch,
)
from .multihost import distribute_batch, global_device_batch, process_slice

__all__ = [
    "batch_sharding",
    "distribute_batch",
    "global_device_batch",
    "make_mesh",
    "process_slice",
    "replicate",
    "replicated",
    "setup_data_parallel",
    "shard_batch",
]
