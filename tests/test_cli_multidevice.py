"""CLI-level --multi-device coverage on the virtual 8-device mesh.

The mesh plumbing is unit-tested at the make_train_step/traverse_paths level
(test_parallel.py, test_traverse.py); these tests exercise the actual CLI
flags end-to-end: `train.py --multi-device` must reproduce the single-device
run's training stats (the sample stream is a pure function of (seed,
iteration), and DP-sharded SPMD must be numerically equivalent), and
`traverse_latent_space.py --multi-device` must emit the same traversal tree.
"""
import json
import os
import os.path as osp

import numpy as np
import pytest


TRAIN_ARGS = [
    "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
    "-K", "2", "-D", "2", "--min-shift-magnitude", "0.15",
    "--max-shift-magnitude", "0.25", "--max-iter", "4", "--batch-size", "8",
    "--log-freq", "2", "--ckp-freq", "4", "--seed", "11",
]
EXP = osp.join("experiments", "complete", "SNGAN_MNIST-LeNet-K2-D2-eps0.15_0.25")


def _run_pipeline(tmp, monkeypatch, extra_train, extra_traverse):
    tmp.mkdir(parents=True, exist_ok=True)
    monkeypatch.chdir(tmp)
    monkeypatch.setenv("WGS_ALLOW_RANDOM_G", "1")
    from warpedganspace_tpu.cli import sample_gan, train, traverse_latent_space

    sample_gan.main(["-g", "SNGAN_MNIST", "--num-samples", "1", "--pool", "p", "--seed", "2"])
    train.main(TRAIN_ARGS + extra_train)
    traverse_latent_space.main(
        ["--exp", EXP, "--pool", "p", "--shift-steps", "2", "--eps", "0.2"]
        + extra_traverse)
    stats = json.load(open(osp.join(EXP, "stats.json")))
    res = osp.join(EXP, "results", "p", "4_0.2_0.8")
    h = [d for d in os.listdir(res) if osp.isdir(osp.join(res, d))][0]

    from warpedganspace_tpu.utils.io import load_pt

    codes = np.asarray(load_pt(osp.join(res, h, "paths_latent_codes.pt")))
    frame_files = sorted(
        osp.join(res, h, "paths_images", "path_000", f)
        for f in os.listdir(osp.join(res, h, "paths_images", "path_000")))
    import cv2

    frames = np.stack([cv2.imread(f) for f in frame_files])
    return stats, codes, frames


def test_train_and_traverse_multi_device_cli(tmp_path, monkeypatch):
    s1, c1, f1 = _run_pipeline(tmp_path / "single", monkeypatch, [], [])
    s8, c8, f8 = _run_pipeline(
        tmp_path / "multi", monkeypatch, ["--multi-device"], ["--multi-device"])

    # Training stats: identical sample stream, SPMD == single-device numerics.
    for k in s1:
        if isinstance(s1[k], dict):
            for it in s1[k]:
                np.testing.assert_allclose(s1[k][it], s8[k][it], rtol=1e-4,
                                           atol=1e-5, err_msg=f"{k}[{it}]")

    # Traversal tree: same codes, visually identical frames (JPEG of uint8
    # renders that may differ in the last bit -> allow 2 gray levels).
    np.testing.assert_allclose(c8, c1, rtol=1e-4, atol=1e-5)
    assert f1.shape == f8.shape
    assert np.max(np.abs(f1.astype(int) - f8.astype(int))) <= 2


def test_initialize_distributed_multiprocess_cpu(tmp_path):
    """Two-process jax.distributed bring-up over the CPU backend (the DCN
    analog SURVEY §2.5 requires): both processes must see the global device
    count and agree on a cross-process psum over a global mesh."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from warpedganspace_tpu.parallel.mesh import initialize_distributed\n"
        f"initialize_distributed('127.0.0.1:{port}', 2, int(sys.argv[1]))\n"
        "import numpy as np\n"
        "import jax.numpy as jnp\n"
        "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "assert len(jax.devices()) == 4, jax.devices()\n"
        "mesh = Mesh(np.array(jax.devices()), ('data',))\n"
        "x = jax.make_array_from_callback(\n"
        "    (4,), NamedSharding(mesh, P('data')),\n"
        "    lambda idx: np.arange(4.0)[idx])\n"
        "total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)\n"
        "assert float(total) == 6.0, float(total)\n"
        "print('proc', sys.argv[1], 'OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
        assert f"proc {i} OK" in outs[i]
