from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    setup_data_parallel,
    shard_batch,
)
from .multihost import distribute_batch, global_device_batch, process_slice
from .tp import (
    make_mesh_2d,
    opt_state_shardings,
    param_partition_specs,
    setup_tensor_parallel,
)

__all__ = [
    "batch_sharding",
    "distribute_batch",
    "global_device_batch",
    "make_mesh",
    "make_mesh_2d",
    "opt_state_shardings",
    "param_partition_specs",
    "process_slice",
    "replicate",
    "replicated",
    "setup_data_parallel",
    "setup_tensor_parallel",
    "shard_batch",
]
