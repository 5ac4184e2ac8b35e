"""End-to-end pipeline test: sample_gan -> train -> checkpoint2model ->
traverse_latent_space on a tiny SNGAN_MNIST config with random generator
weights, exercising the full CLI surface and the experiments/ directory schema.
"""
import json
import os
import os.path as osp

import numpy as np
import pytest


@pytest.fixture()
def pipeline_env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WGS_ALLOW_RANDOM_G", "1")
    return tmp_path


def test_full_pipeline(pipeline_env):
    from warpedganspace_tpu.cli import sample_gan, train, traverse_latent_space, checkpoint2model

    # --- sample a pool of 2 latent codes -----------------------------------
    sample_gan.main([
        "-g", "SNGAN_MNIST", "--num-samples", "2", "--pool", "mini", "--seed", "1",
    ])
    pool_dir = osp.join("experiments", "latent_codes", "SNGAN_MNIST", "mini")
    hashes = sorted(d for d in os.listdir(pool_dir) if osp.isdir(osp.join(pool_dir, d)))
    assert len(hashes) == 2
    for h in hashes:
        assert osp.isfile(osp.join(pool_dir, h, "latent_code.pt"))
        assert osp.isfile(osp.join(pool_dir, h, "image.jpg"))

    # --- train a tiny experiment -------------------------------------------
    train.main([
        "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
        "-K", "3", "-D", "2", "--learn-gammas",
        "--min-shift-magnitude", "0.15", "--max-shift-magnitude", "0.25",
        "--max-iter", "4", "--batch-size", "4", "--log-freq", "2", "--ckp-freq", "2",
    ])
    exp_name = "SNGAN_MNIST-LeNet-K3-D2-LearnGammas-eps0.15_0.25"
    wip = osp.join("experiments", "wip", exp_name)
    complete = osp.join("experiments", "complete", exp_name)
    assert osp.isdir(complete), os.listdir(osp.join("experiments", "wip"))
    with open(osp.join(wip, "args.json")) as f:
        aj = json.load(f)
    assert aj["num_support_sets"] == 3

    # --- checkpoint2model ---------------------------------------------------
    checkpoint2model.main(["--exp", wip])
    assert osp.isfile(osp.join(wip, "models", "support_sets-4.pt"))
    assert osp.isfile(osp.join(wip, "models", "reconstructor-4.pt"))

    # --- traverse -----------------------------------------------------------
    traverse_latent_space.main([
        "--exp", complete, "--pool", "mini", "--shift-steps", "3", "--eps", "0.2",
        "--gif", "--gif-size", "32",
    ])
    res = osp.join(complete, "results", "mini", "6_0.2_1.2")
    assert osp.isdir(res)
    for h in hashes:
        sample_dir = osp.join(res, h)
        assert osp.isfile(osp.join(sample_dir, "original_image.jpg"))
        assert osp.isfile(osp.join(sample_dir, "paths_latent_codes.pt"))
        for k in range(3):
            path_dir = osp.join(sample_dir, "paths_images", "path_{:03d}".format(k))
            frames = sorted(os.listdir(path_dir))
            assert frames == ["{:06d}.jpg".format(t) for t in range(7)]
    for k in range(3):
        assert osp.isfile(osp.join(res, "paths_gifs", "path_{:03d}.gif".format(k)))

    # paths_latent_codes shape parity: (K, 2*steps+1, dim_z).
    from warpedganspace_tpu.utils.io import load_pt

    codes = load_pt(osp.join(res, hashes[0], "paths_latent_codes.pt"))
    assert np.asarray(codes).shape == (3, 7, 128)

    # An EMPTY pool (e.g. an interrupted sample_gan) must fail loudly in a
    # single-process run — not exit 0 with no tree for the attribute stage to
    # trip over. (An empty per-process PARTITION under multi-process stays
    # legal and is covered by test_cli_multiprocess.)
    import pytest

    os.makedirs(osp.join("experiments", "latent_codes", "SNGAN_MNIST", "void"),
                exist_ok=True)
    with pytest.raises(ValueError, match="contains no latent codes"):
        traverse_latent_space.main([
            "--exp", complete, "--pool", "void", "--shift-steps", "3",
            "--eps", "0.2",
        ])


def test_traverse_bf16_dtype(pipeline_env):
    """--dtype bfloat16 renders the same tree (fidelity gate lives in bench)."""
    from warpedganspace_tpu.cli import sample_gan, train, traverse_latent_space

    sample_gan.main(["-g", "SNGAN_MNIST", "--num-samples", "1", "--pool", "bf", "--seed", "5"])
    train.main([
        "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
        "-K", "2", "-D", "2", "--min-shift-magnitude", "0.15",
        "--max-shift-magnitude", "0.25", "--max-iter", "2", "--batch-size", "2",
        "--log-freq", "2", "--ckp-freq", "2",
    ])
    exp = osp.join("experiments", "complete", "SNGAN_MNIST-LeNet-K2-D2-eps0.15_0.25")
    traverse_latent_space.main([
        "--exp", exp, "--pool", "bf", "--shift-steps", "2", "--eps", "0.2",
        "--dtype", "bfloat16",
    ])
    res = osp.join(exp, "results", "bf", "4_0.2_0.8")
    h = [d for d in os.listdir(res) if osp.isdir(osp.join(res, d))][0]
    assert len(os.listdir(osp.join(res, h, "paths_images", "path_000"))) == 5
