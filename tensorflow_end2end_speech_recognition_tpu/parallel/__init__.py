from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    setup_data_parallel,
    shard_batch,
)
from .multihost import distribute_batch, global_device_batch, process_slice
from .pp import (
    apply_conformer_pipelined,
    make_mesh_dp_pp,
    make_mesh_pp,
    microbatch,
    pipeline_apply,
    pipeline_param_specs,
    place_pipeline_params,
    pp_stack_tree,
    pp_unstack_tree,
    setup_pipeline_parallel,
    stack_layers,
    unstack_layers,
)
from .ep import (
    expert_partition_specs,
    make_mesh_dp_ep,
    setup_expert_parallel,
)
from .fsdp import (
    fsdp_partition_specs,
    setup_fsdp,
)
from .sp import (
    make_mesh_dp_sp,
    seq_shard_fn,
    setup_sequence_parallel,
)
from .tp import (
    make_mesh_2d,
    make_mesh_3d,
    opt_state_shardings,
    param_partition_specs,
    setup_tensor_parallel,
)

__all__ = [
    "apply_conformer_pipelined",
    "expert_partition_specs",
    "fsdp_partition_specs",
    "make_mesh_dp_ep",
    "make_mesh_dp_pp",
    "make_mesh_dp_sp",
    "seq_shard_fn",
    "setup_expert_parallel",
    "setup_fsdp",
    "setup_sequence_parallel",
    "make_mesh_pp",
    "microbatch",
    "pipeline_apply",
    "pipeline_param_specs",
    "place_pipeline_params",
    "pp_stack_tree",
    "pp_unstack_tree",
    "setup_pipeline_parallel",
    "stack_layers",
    "unstack_layers",
    "batch_sharding",
    "distribute_batch",
    "global_device_batch",
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_3d",
    "opt_state_shardings",
    "param_partition_specs",
    "process_slice",
    "replicate",
    "replicated",
    "setup_data_parallel",
    "setup_tensor_parallel",
    "shard_batch",
]
