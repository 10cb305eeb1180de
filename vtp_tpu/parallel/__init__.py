from vtp_tpu.parallel.mesh import (
    make_mesh,
    make_cp_mesh,
    active_mesh,
    mesh_axis_size,
    DATA_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
)
from vtp_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipeline_mesh,
    pipeline_apply,
    pipeline_blocks,
)
from vtp_tpu.parallel.sharding import (
    param_partition_specs,
    shard_params,
    batch_sharding,
    maybe_constrain,
    constrain_residual,
    sequence_parallel,
    sequence_parallel_enabled,
    replicated,
)

__all__ = [
    "make_mesh",
    "make_cp_mesh",
    "active_mesh",
    "mesh_axis_size",
    "DATA_AXIS",
    "MODEL_AXIS",
    "SEQ_AXIS",
    "param_partition_specs",
    "shard_params",
    "batch_sharding",
    "maybe_constrain",
    "constrain_residual",
    "sequence_parallel",
    "sequence_parallel_enabled",
    "replicated",
    "PIPE_AXIS",
    "make_pipeline_mesh",
    "pipeline_apply",
    "pipeline_blocks",
]
