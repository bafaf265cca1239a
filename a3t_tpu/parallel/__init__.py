from a3t_tpu.parallel.mesh import (
    MeshConfig, make_mesh, batch_sharding, seq_axis_size)
from a3t_tpu.parallel.sharding import (
    param_partition_spec,
    make_param_shardings,
    moment_partition_spec,
    shard_opt_state,
    shard_variables,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "seq_axis_size",
    "param_partition_spec",
    "make_param_shardings",
    "moment_partition_spec",
    "shard_opt_state",
    "shard_variables",
]
