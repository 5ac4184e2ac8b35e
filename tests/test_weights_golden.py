"""Weights-gated golden-image fidelity tests (``pytest -m weights``).

Offline these SKIP (the CI/dev hosts here have no network). With the real
checkpoints downloaded — ``python download_models.py`` (sha256-verified) —
each generator family loads its REAL pretrained weights through the same
``build_gan`` path the CLIs use and must reproduce the reference's COMMITTED
golden images (``/root/reference/experiments/latent_codes/<pool>/<hash>/
image.jpg``, rendered by the reference torch implementation via
sample_gan.py:150-177 — ``tensor2image(G(z), adaptive=True)``, q95 JPEG) at
>40 dB PSNR. This is the reference's own converted-weights fidelity check
(convert_weight.py:241-254) applied to all four families.
"""
import os
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.weights

REF_POOLS = "/root/reference/experiments/latent_codes"

CASES = [
    # (gan_type, pool subdir, build_gan kwargs)
    ("SNGAN_MNIST", "SNGAN_MNIST/SNGAN_MNIST_10", {}),
    ("SNGAN_AnimeFaces", "SNGAN_AnimeFaces/SNGAN_AnimeFaces_6", {}),
    ("ProgGAN", "ProgGAN/ProgGAN_8", {}),
    ("StyleGAN2", "StyleGAN2/StyleGAN2_6_males", {"stylegan2_resolution": 1024}),
    ("BigGAN", "BigGAN-239/BigGAN-239_4", {"target_classes": [239]}),
]


def _weights_path(gan_type):
    from warpedganspace_tpu.config import GAN_RESOLUTIONS, GAN_WEIGHTS

    res = 1024 if gan_type == "StyleGAN2" else GAN_RESOLUTIONS[gan_type]
    return GAN_WEIGHTS[gan_type]["weights"][res]


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


@pytest.mark.parametrize("gan_type,pool,kwargs", CASES,
                         ids=[c[0] for c in CASES])
def test_golden_images(gan_type, pool, kwargs):
    wpath = _weights_path(gan_type)
    if not osp.isfile(wpath):
        pytest.skip(f"pretrained weights not present ({wpath}); "
                    "run `python download_models.py` first")
    import cv2
    import jax
    import jax.numpy as jnp

    from warpedganspace_tpu.models.gan_load import build_gan
    from warpedganspace_tpu.traverse.images import tensor2image
    from warpedganspace_tpu.utils.io import load_pt

    G = build_gan(gan_type=gan_type, allow_random_init=False, **kwargs)

    pool_dir = osp.join(REF_POOLS, pool)
    hashes = sorted(d for d in os.listdir(pool_dir)
                    if osp.isdir(osp.join(pool_dir, d)))[:2]
    assert hashes, pool_dir
    for h in hashes:
        z = jnp.asarray(np.asarray(load_pt(osp.join(pool_dir, h, "latent_code.pt")),
                                   dtype=np.float32))
        img = np.asarray(G.apply(G.params, z))[0]  # (H, W, C) float
        ours = np.asarray(tensor2image(img, adaptive=True).convert("RGB"))
        golden = cv2.cvtColor(cv2.imread(osp.join(pool_dir, h, "image.jpg")),
                              cv2.COLOR_BGR2RGB)
        assert ours.shape == golden.shape, (h, ours.shape, golden.shape)
        psnr = _psnr(ours, golden)
        assert psnr > 40.0, f"{gan_type}/{h}: PSNR {psnr:.1f} dB <= 40"
