"""Fused all-sets Pallas warp kernel vs the jnp reference formulation.

Runs in the Pallas interpreter on the CPU mesh; the same code path compiles
natively on TPU (where it is the traversal default — see traverse/engine.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.ops import rbf
from warpedganspace_tpu.ops.rbf_pallas import (
    prepare_warp_sets,
    warp_grad_all_sets_fused,
    warp_grad_all_sets_kn,
)


def _random_problem(key, k, two_n, d, n):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sv = jax.random.normal(k1, (k, two_n, d))
    a = jax.random.normal(k2, (k, two_n))
    g = jnp.abs(jax.random.normal(k3, (k, two_n))) * 0.3
    z = jax.random.normal(k4, (n, k, d))
    return sv, a, g, z


@pytest.mark.parametrize(
    "k,two_n,d,n",
    [
        (5, 6, 7, 3),      # unaligned everywhere -> exercises all padding
        (8, 256, 128, 16),  # production-aligned (SNGAN-like)
        (4, 130, 120, 9),   # BigGAN-like d=120, odd 2N
    ],
)
def test_matches_jnp_all_sets(k, two_n, d, n):
    sv, a, g, z = _random_problem(jax.random.key(0), k, two_n, d, n)
    ref = rbf.warp_grad_all_sets(sv, a, g, z)
    got = warp_grad_all_sets_fused(sv, a, g, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # Unit-norm rows.
    norms = jnp.linalg.norm(got, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)


def test_kn_layout_equals_drop_in():
    sv, a, g, z = _random_problem(jax.random.key(1), 6, 16, 40, 5)
    ws = prepare_warp_sets(sv, a, g)
    kn = warp_grad_all_sets_kn(ws, jnp.transpose(z, (1, 0, 2)))
    flat = warp_grad_all_sets_fused(sv, a, g, z)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(kn, (1, 0, 2))), np.asarray(flat), rtol=1e-6
    )


def test_row_blocking_many_rows():
    # More rows than one _ROW_BLOCK -> exercises the minor grid dimension.
    sv, a, g, z = _random_problem(jax.random.key(2), 3, 8, 16, 300)
    ref = rbf.warp_grad_all_sets(sv, a, g, z)
    got = warp_grad_all_sets_fused(sv, a, g, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_bf16_set_storage_close_to_f32():
    """bf16 set storage (the TPU production config; on TPU it is bit-identical
    because the default-precision MXU rounds f32 operands to bf16 anyway).
    Here in the interpreter dots are true f32, so bf16 storage shows the
    expected small rounding — this pins the plumbing (svsq stays exact f32)."""
    sv, a, g, z = _random_problem(jax.random.key(7), 6, 16, 40, 5)
    ws32 = prepare_warp_sets(sv, a, g)
    ws16 = prepare_warp_sets(sv, a, g, dtype=jnp.bfloat16)
    zkn = jnp.transpose(z, (1, 0, 2))
    d32 = warp_grad_all_sets_kn(ws32, zkn)
    d16 = warp_grad_all_sets_kn(ws16, zkn)
    assert ws16.sv.dtype == jnp.bfloat16
    assert ws16.svsq_row.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32), rtol=0.05, atol=0.02)
    cos = np.mean(np.sum(np.asarray(d16) * np.asarray(d32), axis=-1))
    assert cos > 0.999, cos


def test_custom_vjp_matches_jnp_grad():
    sv, a, g, z = _random_problem(jax.random.key(3), 4, 10, 24, 6)

    def loss_pallas(sv, z):
        return jnp.sum(jnp.cos(warp_grad_all_sets_fused(sv, a, g, z)))

    def loss_jnp(sv, z):
        return jnp.sum(jnp.cos(rbf.warp_grad_all_sets(sv, a, g, z)))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(sv, z)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(sv, z)
    for p, j in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(p), np.asarray(j), rtol=1e-4, atol=1e-5)


def test_support_sets_method():
    S = SupportSets(num_support_sets=6, num_support_dipoles=4,
                    support_vectors_dim=20, learn_gammas=True)
    params = S.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(5), (3, 6, 20))
    np.testing.assert_allclose(
        np.asarray(S.direction_all_sets_fused(params, z)),
        np.asarray(S.direction_all_sets(params, z)),
        rtol=2e-5, atol=2e-6,
    )
