"""Discriminator parity tests (StyleGAN2 + BigGAN) vs reference torch models."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_utils import state_dict_numpy, torch_or_skip


def test_stylegan2_discriminator_parity():
    torch = torch_or_skip()
    # Reuse the op-stubbed reference module import from the generator tests.
    from tests.test_stylegan2 import _install_op_stub
    from tests.reference_utils import add_reference_to_path

    add_reference_to_path()
    _install_op_stub(torch)
    from models.StyleGAN2.model import Discriminator as RefD

    torch.manual_seed(0)
    ref = RefD(64).eval()  # 64px keeps the CPU test cheap; same code paths

    from warpedganspace_tpu.convert.stylegan2 import (
        stylegan2_discriminator_params_from_state_dict,
    )
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Discriminator

    disc = StyleGAN2Discriminator(resolution=64)
    params = stylegan2_discriminator_params_from_state_dict(state_dict_numpy(ref), 64)

    x = np.random.RandomState(0).randn(4, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(disc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == ref_out.shape == (4, 1)
    np.testing.assert_allclose(got, ref_out, rtol=1e-2, atol=1e-3)


def test_biggan_discriminator_parity():
    torch = torch_or_skip()
    from tests.reference_utils import add_reference_to_path

    add_reference_to_path()
    from models.BigGAN import BigGAN, utils

    with open("/root/reference/models/BigGAN/generator_config.json") as f:
        config = json.load(f)
    config["resolution"] = utils.imsize_dict[config["dataset"]]
    config["n_classes"] = utils.nclass_dict[config["dataset"]]
    config["D_activation"] = utils.activation_dict[config["D_nl"]]
    config["skip_init"] = True
    config["no_optim"] = True

    torch.manual_seed(0)
    ref = BigGAN.Discriminator(**config).eval()

    from warpedganspace_tpu.convert.biggan import biggan_d_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANDiscriminator

    disc = BigGANDiscriminator()
    params = biggan_d_params_from_state_dict(state_dict_numpy(ref))
    assert len(params["blocks"]) == 6
    assert "attention" in params["blocks"][0]  # D attends at 64 = first block

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    y = np.array([239, 14])
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(
        disc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
    )
    assert got.shape == ref_out.shape == (2, 1)
    np.testing.assert_allclose(got, ref_out, rtol=1e-2, atol=1e-2)


def test_biggan_discriminator_other_resolutions_parity():
    """D arch tables beyond the shipped 128 (reference BigGAN.py:247-279):
    64^2 with dual attention."""
    torch = torch_or_skip()
    from tests.reference_utils import add_reference_to_path

    add_reference_to_path()
    from models.BigGAN import BigGAN

    torch.manual_seed(2)
    ref = BigGAN.Discriminator(D_ch=16, resolution=64, D_attn="32_64",
                               n_classes=20, skip_init=True, no_optim=True).eval()

    from warpedganspace_tpu.convert.biggan import biggan_d_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANDiscriminator

    disc = BigGANDiscriminator(resolution=64, ch=16, n_classes=20, attention="32_64")
    params = biggan_d_params_from_state_dict(state_dict_numpy(ref))
    assert len(params["blocks"]) == 5

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    y = np.array([3, 7])
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(
        disc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
    )
    np.testing.assert_allclose(got, ref_out, rtol=1e-2, atol=1e-2)


def test_biggan_gd_pair():
    """G_D wrapper smoke: fake/real scoring with concatenated batches."""
    import jax

    from warpedganspace_tpu.models.biggan import (
        BigGAN_GD,
        BigGANDiscriminator,
        BigGANGenerator,
    )

    G = BigGANGenerator()
    D = BigGANDiscriminator()
    gd = BigGAN_GD(G, D)
    g_params = G.init(jax.random.key(0))
    d_params = D.init(jax.random.key(1))

    z = jax.random.normal(jax.random.key(2), (2, 120))
    gy = jnp.array([239, 239])
    x_real = jax.random.normal(jax.random.key(3), (2, 128, 128, 3))
    dy = jnp.array([14, 14])
    d_fake, d_real = gd.apply(g_params, d_params, z, gy, x=x_real, dy=dy)
    assert d_fake.shape == (2, 1) and d_real.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(d_fake)))
