"""Device-mesh construction and sharding helpers.

This replaces the reference's parallelism layer wholesale (SURVEY §2.5):
``nn.DataParallel`` scatter/gather (lib/trainer.py:16-21,162-166) and the
thread/queue SyncBN reductions (models/BigGAN/sync_batchnorm/) become a
``jax.sharding.Mesh`` with named axes and XLA collectives over ICI:

- **Data parallelism** (the only strategy the workload needs — the trainable
  state is tiny and the generator is frozen): the batch dimension is sharded
  over the ``"data"`` axis; parameters are replicated; XLA inserts the gradient
  all-reduce automatically from the sharding constraints.
- Multi-host: ``jax.distributed.initialize()`` before :func:`make_mesh` makes
  the same code span slices over DCN.

All entry points accept ``mesh=None`` and degrade to single-device execution,
so the same train step runs on 1 chip or a v4-32 without code changes.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up: call once per host before :func:`make_mesh` to span
    slices over DCN (replaces any NCCL/MPI-style init; the reference is
    single-process and has none — SURVEY §2.5). No-op when args are absent and
    no cluster environment is detected. Idempotent: every CLI entry point calls
    this, so a process that chains CLIs (train then traverse) initializes the
    backend exactly once."""
    import os

    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None or "COORDINATOR_ADDRESS" in os.environ:
        # jax.distributed only reads ITS OWN env vars (JAX_COORDINATOR_ADDRESS
        # etc.) — our COORDINATOR_ADDRESS convenience vars must be passed
        # explicitly or they would be silently ignored.
        if coordinator_address is None:
            coordinator_address = os.environ["COORDINATOR_ADDRESS"]
        if num_processes is None and "NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["NUM_PROCESSES"])
        if process_id is None and "PROCESS_ID" in os.environ:
            process_id = int(os.environ["PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_coordinator() -> bool:
    """True on the process that owns all filesystem/TensorBoard/stdout side
    effects of a multi-process run (process 0). The reference is single-process
    so every write is implicitly coordinator-gated there; under jax.distributed
    the Trainer and CLIs gate writes through this so a 2-host run produces ONE
    consistent experiment tree instead of two racing writers."""
    return jax.process_index() == 0


def sync_processes(name: str) -> None:
    """Cross-process barrier (no-op single-process). Used at ordering points
    where a non-coordinator process is about to READ files the coordinator
    writes — e.g. the wip->complete experiment copy before traversal starts."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def assert_identical_across_processes(tree, name: str) -> None:
    """Hard-verify that every process holds a byte-identical host-local copy
    of ``tree`` before :func:`replicate_to_global` treats it as "identical by
    construction". A partial checkpoint read / torn sidecar on one host would
    otherwise silently produce divergent "replicated" global arrays and
    corrupt SPMD training with no error. No-op single-process."""
    if jax.process_count() <= 1:
        return
    import hashlib

    from jax.experimental import multihost_utils

    h = hashlib.blake2b(digest_size=16)
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = leaf
        if hasattr(arr, "dtype") and jax.dtypes.issubdtype(
            arr.dtype, jax.dtypes.prng_key
        ):
            arr = jax.random.key_data(arr)
        arr = np.ascontiguousarray(np.asarray(arr))
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    local = np.frombuffer(h.digest(), dtype=np.uint8).astype(np.int32)
    coord = multihost_utils.broadcast_one_to_all(local)
    if not np.array_equal(local, coord):
        raise RuntimeError(
            f"process {jax.process_index()}: host-local {name} differs from "
            "the coordinator's (checkpoint/sidecar read divergence?) — "
            "refusing to replicate divergent state into an SPMD run"
        )


def replicate_to_global(tree, mesh: Mesh):
    """Host-local pytree -> fully-replicated global jax.Arrays over ``mesh``.

    Multi-process jit over a global mesh cannot consume process-local
    (eagerly created or host-loaded) arrays; every process holds an identical
    copy of the frozen params / train state by construction (same files, same
    seeds), so replication is the correct global view. Single-process meshes
    pass through jax.device_put just the same."""
    rep = NamedSharding(mesh, P())

    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, rep, lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree)


def partition_work(items, num_shards: int = 1, shard_index: int = 0):
    """Deterministic host-level work partition for the inference CLIs.

    Traversal and attribute evaluation are embarrassingly parallel over
    latent codes / hash dirs (each unit touches disjoint files), so scaling
    across HOSTS needs no collectives at all: every process slices the same
    sorted work list by ``items[shard_index::num_shards]``. The reference has
    no multi-host story; this is the TPU-pod-scale equivalent for the eval
    pipeline (training scales through the mesh instead — see make_mesh)."""
    if not 0 <= shard_index < num_shards:
        raise ValueError(
            f"shard_index {shard_index} out of range for {num_shards} shards")
    return list(items)[shard_index::num_shards]


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """Build a 1D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh | None, axis_name: str = DATA_AXIS):
    """NamedSharding that splits axis 0 (batch) across the mesh."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh | None):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh | None, axis_name: str = DATA_AXIS):
    """Constrain a batched intermediate to be sharded over the data axis."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis_name)))
