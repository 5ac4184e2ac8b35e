"""Interop with the reference's committed artifacts: the latent-code pools
under /root/reference/experiments/latent_codes are torch.save files that our
pipeline must consume directly (pools are interchangeable in both directions).
"""
import os
import os.path as osp
import shutil

import numpy as np
import pytest

REF_POOLS = "/root/reference/experiments/latent_codes"


@pytest.mark.skipif(not osp.isdir(REF_POOLS), reason="reference fixtures not mounted")
def test_reference_latent_pools_load():
    from warpedganspace_tpu.utils.io import load_pt

    expected_dims = {
        "SNGAN_MNIST": 128,
        "SNGAN_AnimeFaces": 128,
        "BigGAN-239": 120,
        "ProgGAN": 512,
        "StyleGAN2": 512,
    }
    seen = 0
    for gan_dir, dim in expected_dims.items():
        root = osp.join(REF_POOLS, gan_dir)
        if not osp.isdir(root):
            continue
        pool = os.listdir(root)[0]
        for h in sorted(os.listdir(osp.join(root, pool)))[:2]:
            z = np.asarray(load_pt(osp.join(root, pool, h, "latent_code.pt")))
            assert z.shape == (1, dim), (gan_dir, z.shape)
            assert np.isfinite(z).all()
            seen += 1
    assert seen >= 8


@pytest.mark.skipif(not osp.isdir(REF_POOLS), reason="reference fixtures not mounted")
def test_traversal_consumes_reference_pool(tmp_path, monkeypatch):
    """Full traversal over the reference's committed SNGAN_MNIST pool."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WGS_ALLOW_RANDOM_G", "1")

    src = osp.join(REF_POOLS, "SNGAN_MNIST")
    pool_name = os.listdir(src)[0]
    dst = osp.join("experiments", "latent_codes", "SNGAN_MNIST", pool_name)
    os.makedirs(osp.dirname(dst), exist_ok=True)
    shutil.copytree(osp.join(src, pool_name), dst)
    hashes = sorted(d for d in os.listdir(dst) if osp.isdir(osp.join(dst, d)))

    from warpedganspace_tpu.cli import train, traverse_latent_space

    train.main([
        "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
        "-K", "2", "-D", "2", "--min-shift-magnitude", "0.15",
        "--max-shift-magnitude", "0.25", "--max-iter", "2", "--batch-size", "2",
        "--log-freq", "2", "--ckp-freq", "2",
    ])
    exp = osp.join("experiments", "complete", "SNGAN_MNIST-LeNet-K2-D2-eps0.15_0.25")
    traverse_latent_space.main([
        "--exp", exp, "--pool", pool_name, "--shift-steps", "1", "--eps", "0.2",
    ])
    res = osp.join(exp, "results", pool_name, "2_0.2_0.4")
    for h in hashes:
        assert osp.isdir(osp.join(res, h, "paths_images", "path_000")), h
