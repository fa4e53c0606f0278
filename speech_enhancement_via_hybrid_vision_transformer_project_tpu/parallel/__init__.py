"""Parallelism layer: mesh construction and sharding rules (DP + TP)."""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    distribute_batch,
    initialize_distributed,
    local_batch_size,
    make_mesh,
    mesh_from_config,
    replicated,
)
from .sharding import shard_variables, tp_param_specs  # noqa: F401
