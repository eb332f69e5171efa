from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    STAGE_AXIS,
    make_mesh,
    make_mesh_tp,
    make_mesh_pp,
    replicated,
    data_sharded,
    shard_batch,
    replicate,
    fsdp_sharding,
    fsdp_shard,
    tp_sharding,
    tp_shard,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "STAGE_AXIS", "make_mesh", "make_mesh_tp",
    "make_mesh_pp", "replicated", "data_sharded", "shard_batch", "replicate",
    "fsdp_sharding", "fsdp_shard", "tp_sharding", "tp_shard",
]
