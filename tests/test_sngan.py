"""SNGAN generator parity vs the reference torch implementation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpedganspace_tpu.convert import sngan_params_from_state_dict
from warpedganspace_tpu.models.sngan import SNGAN_CONFIGS, SNGANGenerator

from tests.reference_utils import add_reference_to_path, state_dict_numpy, torch_or_skip


def _build_reference_sngan(gan_type):
    torch = torch_or_skip()
    add_reference_to_path()
    from models.SNGAN.distribution import NormalDistribution
    from models.SNGAN.sn_gen_resnet import SN_RES_GEN_CONFIGS, make_resnet_generator

    cfg = SNGAN_CONFIGS[gan_type]
    model_name = "sn_resnet32" if cfg["img_size"] == 32 else "sn_resnet64"
    torch.manual_seed(0)
    G = make_resnet_generator(
        resnet_gen_config=SN_RES_GEN_CONFIGS[model_name],
        img_size=cfg["img_size"],
        channels=cfg["image_channels"],
        distribution=NormalDistribution(cfg["dim_z"]),
    )
    G.eval()
    # Give BN non-trivial running stats so eval-mode normalization is exercised.
    with torch.no_grad():
        for m in G.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.5)
    return G


@pytest.mark.parametrize("gan_type", ["SNGAN_MNIST", "SNGAN_AnimeFaces"])
def test_sngan_forward_parity(gan_type):
    torch = torch_or_skip()
    G = _build_reference_sngan(gan_type)
    cfg = SNGAN_CONFIGS[gan_type]

    gen = SNGANGenerator.from_gan_type(gan_type)
    params = sngan_params_from_state_dict(state_dict_numpy(G), gen.channels)

    B = 3
    rng = np.random.RandomState(1)
    z = rng.randn(B, cfg["dim_z"]).astype(np.float32)
    shift = 0.2 * rng.randn(B, cfg["dim_z"]).astype(np.float32)

    with torch.no_grad():
        ref_img = G.model(torch.from_numpy(z + shift)).numpy()  # NCHW

    img = gen.apply(params, jnp.asarray(z), jnp.asarray(shift))  # NHWC
    img_nchw = np.asarray(img).transpose(0, 3, 1, 2)

    assert img_nchw.shape == ref_img.shape == (
        B,
        cfg["image_channels"],
        cfg["img_size"],
        cfg["img_size"],
    )
    np.testing.assert_allclose(img_nchw, ref_img, rtol=1e-3, atol=2e-5)


def test_sngan_jit_and_grad_through_frozen_g():
    """The contrastive loss backprops through the frozen G into the shift
    (reference trainer.py:250); check the jitted vjp path works and is finite."""
    gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    params = gen.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, gen.dim_z))

    def loss(shift):
        img = gen.apply(params, z, shift)
        return jnp.mean(jnp.square(img))

    g = jax.jit(jax.grad(loss))(jnp.zeros_like(z))
    assert g.shape == z.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0
