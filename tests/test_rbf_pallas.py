"""Pallas RBF kernel vs the jnp reference (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.ops import rbf
from warpedganspace_tpu.ops.rbf_pallas import warp_grad_pallas


@pytest.mark.parametrize("k,n,d,b", [(5, 4, 64, 7), (3, 3, 120, 4), (8, 2, 128, 16)])
def test_pallas_matches_reference(k, n, d, b):
    """Covers aligned (128) and unaligned (64, 120) latent dims and odd 2N."""
    cfg = SupportSets(num_support_sets=k, num_support_dipoles=n, support_vectors_dim=d)
    params = cfg.init(jax.random.key(0))
    gammas = cfg.gammas(params)
    z = jax.random.normal(jax.random.key(1), (b, d))
    idx = jax.random.randint(jax.random.key(2), (b,), 0, k)

    want = rbf.warp_grad(params["support_sets"], params["alphas"], gammas, z, idx)
    got = warp_grad_pallas(
        params["support_sets"], params["alphas"], gammas, z, idx, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_all_sets_formulation_matches_gather():
    """The traversal formulation (no gather) == per-row gather formulation."""
    cfg = SupportSets(num_support_sets=4, num_support_dipoles=3, support_vectors_dim=16)
    params = cfg.init(jax.random.key(3))
    gammas = cfg.gammas(params)
    n_codes = 5
    z = jax.random.normal(jax.random.key(4), (n_codes, 4, 16))

    all_out = rbf.warp_grad_all_sets(params["support_sets"], params["alphas"], gammas, z)

    z_flat = z.reshape(-1, 16)
    idx = jnp.tile(jnp.arange(4, dtype=jnp.int32), n_codes)
    gathered = rbf.warp_grad(params["support_sets"], params["alphas"], gammas, z_flat, idx)
    np.testing.assert_allclose(
        np.asarray(all_out.reshape(-1, 16)), np.asarray(gathered), rtol=1e-4, atol=1e-6
    )


def test_pallas_value_and_grad_fused():
    """The fused kernel's f(z) output matches the jnp reference."""
    from warpedganspace_tpu.ops.rbf_pallas import warp_value_and_grad_pallas

    cfg = SupportSets(num_support_sets=4, num_support_dipoles=3, support_vectors_dim=64)
    params = cfg.init(jax.random.key(5))
    gammas = cfg.gammas(params)
    z = jax.random.normal(jax.random.key(6), (6, 64))
    idx = jax.random.randint(jax.random.key(7), (6,), 0, 4)

    f_ref, g_ref = rbf.warp_value_and_grad(
        params["support_sets"], params["alphas"], gammas, z, idx)
    f, g = warp_value_and_grad_pallas(
        params["support_sets"], params["alphas"], gammas, z, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
