"""Parallelism tests: cross-replica (sync) BatchNorm and mesh helpers on the
virtual 8-device CPU mesh."""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.parallel import batch_sharding, make_mesh, shard_batch


def test_cross_replica_batch_norm_matches_global():
    """batch_norm(axis_name=...) under shard_map must equal single-device BN on
    the full batch — the TPU equivalent of the reference SynchronizedBatchNorm
    (models/BigGAN/sync_batchnorm/batchnorm.py:48-158)."""
    mesh = make_mesh()
    n_dev = jax.device_count()
    b = 4 * n_dev
    x = jax.random.normal(jax.random.key(0), (b, 6, 6, 16)) * 2.0 + 1.0
    params = nn.batch_norm_init(16)
    params["scale"] = params["scale"] * 1.5
    params["bias"] = params["bias"] + 0.3

    y_global, new_global = nn.batch_norm(params, x, train=True)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
    )
    def sync_bn(params, x_shard):
        y, new_p = nn.batch_norm(params, x_shard, train=True, axis_name="data")
        return y, new_p

    y_sync, new_sync = sync_bn(params, x)

    np.testing.assert_allclose(np.asarray(y_sync), np.asarray(y_global), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_sync["mean"]), np.asarray(new_global["mean"]), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(new_sync["var"]), np.asarray(new_global["var"]), rtol=1e-4, atol=1e-6
    )


def test_local_bn_differs_from_sync_bn():
    """Sanity: without the axis_name pmean, per-shard stats differ from global."""
    mesh = make_mesh()
    n_dev = jax.device_count()
    # Give each shard a different mean so local != global.
    x = jnp.arange(n_dev * 2, dtype=jnp.float32).reshape(-1, 1, 1, 1)
    x = jnp.broadcast_to(x, (n_dev * 2, 2, 2, 1))
    params = nn.batch_norm_init(1)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"))
    def local_bn(params, x_shard):
        y, _ = nn.batch_norm(params, x_shard, train=True)
        return y

    y_local = local_bn(params, x)
    y_global, _ = nn.batch_norm(params, x, train=True)
    assert float(jnp.abs(y_local - y_global).max()) > 0.1


def test_shard_batch_layout():
    mesh = make_mesh()
    x = jnp.zeros((jax.device_count() * 2, 7))
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert len(sharded.sharding.device_set) == jax.device_count()

    @jax.jit
    def f(v):
        return shard_batch(v * 2, mesh)

    out = f(x)
    assert out.shape == x.shape
