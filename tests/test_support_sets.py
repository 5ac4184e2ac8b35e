"""SupportSets / RBF warp tests: analytic values + parity vs the reference torch impl."""
import importlib.util
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.ops import rbf

REF_SUPPORT_SETS = "/root/reference/lib/support_sets.py"


def _load_reference_support_sets():
    if not osp.isfile(REF_SUPPORT_SETS):
        pytest.skip("reference implementation not mounted")
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location("ref_support_sets", REF_SUPPORT_SETS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_init_shapes_and_radii():
    cfg = SupportSets(num_support_sets=8, num_support_dipoles=4, support_vectors_dim=16)
    params = cfg.init(jax.random.key(0))
    sv = params["support_sets"]
    assert sv.shape == (8, 8, 16)
    assert params["alphas"].shape == (8, 8)
    assert params["loggamma"].shape == (8, 1)
    # Every support vector of set k has norm r_k = 1 + 3k/K.
    norms = jnp.linalg.norm(sv, axis=-1)
    expected = 1.0 + 3.0 * jnp.arange(8) / 8.0
    np.testing.assert_allclose(norms, jnp.broadcast_to(expected[:, None], norms.shape), rtol=1e-5)
    # Antipodal interleaving: row 2i+1 == -row 2i.
    np.testing.assert_allclose(sv[:, 1::2], -sv[:, 0::2], rtol=1e-5)
    # Alternating alphas.
    np.testing.assert_allclose(params["alphas"][:, 0::2], 1.0)
    np.testing.assert_allclose(params["alphas"][:, 1::2], -1.0)
    # loggamma init = log(1/d).
    np.testing.assert_allclose(params["loggamma"], np.log(1.0 / 16.0), rtol=1e-6)


def test_warp_grad_matches_autodiff_of_value():
    """grad f must equal jax.grad of the closed-form f (before normalization)."""
    cfg = SupportSets(num_support_sets=5, num_support_dipoles=3, support_vectors_dim=8)
    params = cfg.init(jax.random.key(1))
    z = jax.random.normal(jax.random.key(2), (6, 8))
    idx = jnp.array([0, 1, 2, 3, 4, 0], dtype=jnp.int32)
    gammas = cfg.gammas(params)

    analytic = rbf.warp_grad(
        params["support_sets"], params["alphas"], gammas, z, idx, normalize=False
    )
    autodiff = jax.vmap(
        lambda zi, ii: jax.grad(
            lambda q: rbf.warp_value(
                params["support_sets"], params["alphas"], gammas, q[None], ii[None]
            )[0]
        )(zi)
    )(z, idx)
    np.testing.assert_allclose(analytic, autodiff, rtol=1e-4, atol=1e-6)


def test_direction_is_unit_norm():
    cfg = SupportSets(num_support_sets=4, num_support_dipoles=8, support_vectors_dim=32)
    params = cfg.init(jax.random.key(3))
    z = jax.random.normal(jax.random.key(4), (16, 32))
    idx = jnp.zeros((16,), dtype=jnp.int32)
    d = cfg.direction(params, z, idx)
    np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("learn_gammas", [False, True])
def test_parity_vs_reference_torch(learn_gammas):
    """Bit-level parity of the forward vs the reference SupportSets.forward,
    using the reference's own randomly initialized parameters imported through
    the torch-state-dict converter."""
    torch = pytest.importorskip("torch")
    mod = _load_reference_support_sets()

    K, N, d, B = 7, 5, 12, 9
    torch.manual_seed(0)
    ref = mod.SupportSets(
        num_support_sets=K,
        num_support_dipoles=N,
        support_vectors_dim=d,
        learn_alphas=False,
        learn_gammas=learn_gammas,
        gamma=1.0 / d,
    )
    # Perturb loggamma so the learned-gamma path is actually exercised.
    if learn_gammas:
        with torch.no_grad():
            ref.LOGGAMMA.add_(0.3 * torch.randn_like(ref.LOGGAMMA))

    cfg = SupportSets(K, N, d, learn_gammas=learn_gammas, gamma=1.0 / d)
    params = cfg.from_torch_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )

    z_t = torch.randn(B, d)
    idx = np.random.RandomState(1).randint(0, K, size=B)
    mask = torch.zeros(B, K)
    mask[torch.arange(B), torch.from_numpy(idx)] = 1.0

    with torch.no_grad():
        ref_out = ref(mask, z_t).numpy()
    jax_out = np.asarray(
        cfg.direction(params, jnp.asarray(z_t.numpy()), jnp.asarray(idx, dtype=jnp.int32))
    )
    np.testing.assert_allclose(jax_out, ref_out, rtol=2e-4, atol=2e-5)


def test_torch_state_dict_roundtrip():
    cfg = SupportSets(num_support_sets=3, num_support_dipoles=2, support_vectors_dim=4)
    params = cfg.init(jax.random.key(7))
    sd = cfg.to_torch_state_dict(params)
    assert sd["SUPPORT_SETS"].shape == (3, 2 * 2 * 4)
    back = cfg.from_torch_state_dict(sd)
    for k in params:
        np.testing.assert_allclose(params[k], back[k], rtol=1e-6)
