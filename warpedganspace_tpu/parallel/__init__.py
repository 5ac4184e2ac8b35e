"""SPMD parallelism over TPU device meshes."""

from warpedganspace_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    partition_work,
    replicate_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "partition_work", "replicate_sharding",
           "shard_batch"]
