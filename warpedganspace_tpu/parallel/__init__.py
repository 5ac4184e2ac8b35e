"""SPMD parallelism over TPU device meshes."""

from warpedganspace_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    initialize_distributed,
    is_coordinator,
    partition_work,
    replicate_sharding,
    replicate_to_global,
    shard_batch,
    sync_processes,
)

__all__ = ["make_mesh", "batch_sharding", "initialize_distributed",
           "is_coordinator", "partition_work", "replicate_sharding",
           "replicate_to_global", "shard_batch", "sync_processes"]
