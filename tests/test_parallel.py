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


def test_sa_attention_kernel_under_mesh_and_remat():
    """The fused SA attention kernel must (1) produce identical values and
    gradients when the batch is sharded over the mesh (BigGAN DP training runs
    it under sharding constraints) and (2) compose with jax.checkpoint (the
    --remat path replays the custom_vjp forward)."""
    from warpedganspace_tpu.ops.attn_pallas import _kernel_fits, sa_attention_fusable

    mesh = make_mesh()
    n_dev = jax.device_count()
    b, n, m, dk, dv = n_dev, 64, 128, 8, 16
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    theta = jax.random.normal(k1, (b, n, dk))
    phi = jax.random.normal(k2, (b, m, dk))
    g = jax.random.normal(k3, (b, m, dv))
    assert _kernel_fits(theta, g)

    def loss(t, p, gg):
        return jnp.sum(sa_attention_fusable(t, p, gg) ** 2)

    want_y = sa_attention_fusable(theta, phi, g)
    want_g = jax.grad(loss, argnums=(0, 1, 2))(theta, phi, g)

    # (1) batch sharded over the mesh — and actually PARTITIONED, not
    # all-gathered + replicated (the op carries a custom_partitioning rule;
    # a bare pallas_call would be all-gathered by GSPMD).
    spec = jax.sharding.NamedSharding(mesh, P("data"))
    ts, ps, gs = (jax.device_put(a, spec) for a in (theta, phi, g))
    fwd = jax.jit(sa_attention_fusable)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    for compiled in (fwd.lower(ts, ps, gs).compile(),
                     grad.lower(ts, ps, gs).compile()):
        assert "all-gather" not in compiled.as_text()
    got_y = fwd(ts, ps, gs)
    assert got_y.sharding.spec == P("data")
    got_g = grad(ts, ps, gs)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-5)
    for a, bb in zip(got_g, want_g):
        assert a.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)

    # (2) under jax.checkpoint the custom_vjp forward is replayed at bwd time.
    remat_loss = jax.checkpoint(loss)
    got_r = jax.jit(jax.grad(remat_loss, argnums=(0, 1, 2)))(theta, phi, g)
    for a, bb in zip(got_r, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)
