from .mesh import (
    DATA_AXIS,
    make_mesh,
    replicated,
    data_sharded,
    shard_batch,
    replicate,
    fsdp_sharding,
    fsdp_shard,
)

__all__ = [
    "DATA_AXIS", "make_mesh", "replicated", "data_sharded", "shard_batch",
    "replicate", "fsdp_sharding", "fsdp_shard",
]
