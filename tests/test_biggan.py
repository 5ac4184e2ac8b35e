"""BigGAN generator parity vs the reference torch implementation (random
weights, eval mode, SN folded through the converter)."""
import json
import math

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_utils import add_reference_to_path, state_dict_numpy, torch_or_skip


@pytest.fixture(scope="module")
def ref_biggan():
    torch = torch_or_skip()
    add_reference_to_path()
    from models.BigGAN import BigGAN, utils

    with open("/root/reference/models/BigGAN/generator_config.json") as f:
        config = json.load(f)
    config["resolution"] = utils.imsize_dict[config["dataset"]]
    config["n_classes"] = utils.nclass_dict[config["dataset"]]
    config["G_activation"] = utils.activation_dict[config["G_nl"]]
    config["D_activation"] = utils.activation_dict[config["D_nl"]]
    config["skip_init"] = True
    config["no_optim"] = True

    torch.manual_seed(0)
    G = BigGAN.Generator(**config)
    # Give BN layers / SN buffers non-trivial values so every code path is
    # actually exercised at eval.
    with torch.no_grad():
        for name, buf in G.named_buffers():
            if name.endswith("stored_mean"):
                buf.normal_(0, 0.1)
            elif name.endswith("stored_var"):
                buf.uniform_(0.6, 1.5)
    G.eval()
    return torch, G


def test_biggan_forward_parity(ref_biggan):
    torch, G = ref_biggan
    from warpedganspace_tpu.convert.biggan import biggan_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANGenerator

    gen = BigGANGenerator(target_classes=(239,))
    params = biggan_params_from_state_dict(state_dict_numpy(G))
    assert len(params["blocks"]) == 5
    assert "attention" in params["blocks"][3]

    rng = np.random.RandomState(0)
    B = 2
    z = rng.randn(B, 120).astype(np.float32)
    shift = 0.1 * rng.randn(B, 120).astype(np.float32)
    y = np.array([239, 239])

    with torch.no_grad():
        y_t = torch.from_numpy(y)
        ref_img = G(torch.from_numpy(z + shift), G.shared(y_t)).numpy()

    img = np.asarray(
        gen.apply(params, jnp.asarray(z), jnp.asarray(shift), y=jnp.asarray(y))
    ).transpose(0, 3, 1, 2)
    assert img.shape == ref_img.shape == (B, 3, 128, 128)

    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(img, ref_img, rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("resolution,ch,attn", [(64, 16, "32_64"), (256, 16, "64")])
def test_biggan_other_resolutions_parity(resolution, ch, attn):
    """All reference arch tables (BigGAN.py:13-51), not just the shipped 128:
    64^2 with dual attention and 256^2 (7 slots -> dim_z shrinks 120->119)."""
    torch = torch_or_skip()
    add_reference_to_path()
    from models.BigGAN import BigGAN

    torch.manual_seed(1)
    G = BigGAN.Generator(
        G_ch=ch, dim_z=120, resolution=resolution, G_attn=attn, n_classes=20,
        G_shared=True, shared_dim=16, hier=True, skip_init=True, no_optim=True)
    with torch.no_grad():
        for name, buf in G.named_buffers():
            if name.endswith("stored_mean"):
                buf.normal_(0, 0.1)
            elif name.endswith("stored_var"):
                buf.uniform_(0.6, 1.5)
    G.eval()

    from warpedganspace_tpu.convert.biggan import biggan_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANGenerator

    gen = BigGANGenerator(resolution=resolution, ch=ch, dim_z=120, shared_dim=16,
                          n_classes=20, attention=attn, target_classes=(3,))
    assert gen.dim_z_effective == G.dim_z  # reference shrinks dim_z in-place
    params = biggan_params_from_state_dict(state_dict_numpy(G))

    rng = np.random.RandomState(2)
    z = rng.randn(2, G.dim_z).astype(np.float32)
    y = np.array([3, 7])
    with torch.no_grad():
        ref_img = G(torch.from_numpy(z), G.shared(torch.from_numpy(y))).numpy()
    img = np.asarray(
        gen.apply(params, jnp.asarray(z), y=jnp.asarray(y))
    ).transpose(0, 3, 1, 2)
    assert img.shape == ref_img.shape == (2, 3, resolution, resolution)
    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img - ref_img) ** 2)))
    assert psnr > 40.0, f"{resolution}: PSNR {psnr:.1f} dB"


def test_biggan_default_class_sampling(ref_biggan):
    _, G = ref_biggan
    from warpedganspace_tpu.convert.biggan import biggan_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANGenerator

    gen = BigGANGenerator(target_classes=(14, 239))
    params = biggan_params_from_state_dict(state_dict_numpy(G))
    z = jnp.asarray(np.random.RandomState(1).randn(4, 120).astype(np.float32))
    img = gen.apply(params, z)  # classes drawn internally
    assert img.shape == (4, 128, 128, 3)
    # Deterministic: same z -> same classes -> same image.
    img2 = gen.apply(params, z)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), rtol=1e-6)


def test_sa_attention_kernel_matches_jnp():
    """The fused attention kernel (ops/attn_pallas.py) must match the jnp
    formulation in values AND gradients at BigGAN's aligned shapes, and the
    unaligned-shape fallback must route to jnp."""
    import jax
    import jax.numpy as jnp

    from warpedganspace_tpu.ops.attn_pallas import (
        _jnp_attention,
        _kernel_fits,
        sa_attention_fusable,
    )

    key = jax.random.key(0)
    for b, n, m, dk, dv in ((2, 4096, 1024, 24, 96), (3, 256, 128, 8, 16)):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, n), 3)
        theta = jax.random.normal(k1, (b, n, dk))
        phi = jax.random.normal(k2, (b, m, dk))
        g = jax.random.normal(k3, (b, m, dv))
        got = sa_attention_fusable(theta, phi, g)
        want = _jnp_attention(theta, phi, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # All three input gradients route through the fused backward kernel.
        def loss_k(t, p, gg):
            return jnp.sum(sa_attention_fusable(t, p, gg) ** 2)

        def loss_j(t, p, gg):
            return jnp.sum(_jnp_attention(t, p, gg) ** 2)

        gks = jax.grad(loss_k, argnums=(0, 1, 2))(theta, phi, g)
        gjs = jax.grad(loss_j, argnums=(0, 1, 2))(theta, phi, g)
        # Tolerance: the fused backward accumulates dphi/dg across query
        # blocks in a different reduction order than the jnp VJP.
        for gk, gj in zip(gks, gjs):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gj),
                                       rtol=1e-3, atol=1e-3)

    # Unaligned key count -> jnp fallback (still f32-softmax semantics).
    theta = jax.random.normal(key, (2, 64, 8))
    phi = jax.random.normal(key, (2, 100, 8))
    g = jax.random.normal(key, (2, 100, 16))
    assert not _kernel_fits(theta, g)
    np.testing.assert_allclose(np.asarray(sa_attention_fusable(theta, phi, g)),
                               np.asarray(_jnp_attention(theta, phi, g)))
