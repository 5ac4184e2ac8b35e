"""SPMD parallelism over TPU device meshes."""

from warpedganspace_tpu.parallel.audit import (
    audit_collectives,
    param_bytes,
    shape_bytes,
)
from warpedganspace_tpu.parallel.mesh import (
    assert_identical_across_processes,
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

__all__ = ["assert_identical_across_processes", "audit_collectives",
           "make_mesh", "batch_sharding",
           "initialize_distributed", "is_coordinator", "param_bytes",
           "partition_work", "replicate_sharding", "replicate_to_global",
           "shape_bytes", "shard_batch", "sync_processes"]
