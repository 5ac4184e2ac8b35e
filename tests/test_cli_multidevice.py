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
    # Codes: SPMD == single-device is not a bitwise contract — sharded and
    # unsharded graphs fuse/reorder f32 reductions differently, and the tiny
    # training divergence integrates through the normalized warp field
    # (observed up to ~3e-5 abs on these unit-scale codes).
    np.testing.assert_allclose(c8, c1, rtol=1e-4, atol=1e-4)
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


# Worker for the cross-process train-step test: 2 processes x 2 local CPU
# devices = a 4-device GLOBAL mesh spanning DCN (the jax.distributed backend
# SURVEY §2.5 names). The full contrastive train step — both generator
# forwards, the warp, the backward through frozen G, both Adam updates — is
# jitted over the global mesh; all step inputs are built as global replicated
# arrays (out_shardings=P()) so the SPMD program spans both processes.
_TRAIN_WORKER = """\
import json
import sys

import jax

jax.config.update('jax_platforms', 'cpu')

from warpedganspace_tpu.parallel.mesh import initialize_distributed, make_mesh

initialize_distributed('127.0.0.1:{port}', 2, int(sys.argv[1]))
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

from jax.sharding import NamedSharding, PartitionSpec as P

from warpedganspace_tpu.models.api import GeneratorBundle
from warpedganspace_tpu.models.reconstructor import Reconstructor
from warpedganspace_tpu.models.sngan import SNGANGenerator
from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.train import (
    TrainStepConfig, init_train_state, make_train_step)

mesh = make_mesh()
rep = NamedSharding(mesh, P())
gen = SNGANGenerator.from_gan_type('SNGAN_MNIST')
K = 2
S = SupportSets(num_support_sets=K, num_support_dipoles=2,
                support_vectors_dim=gen.dim_z, learn_gammas=True)
R = Reconstructor('LeNet', dim=K, channels=1)
cfg = TrainStepConfig(batch_size=8, num_support_sets=K,
                      min_shift_magnitude=0.15, max_shift_magnitude=0.25)
g_params = jax.jit(lambda s: gen.init(jax.random.key(s)), out_shardings=rep)(0)
G = GeneratorBundle(name='SNGAN_MNIST', dim_z=gen.dim_z, resolution=32,
                    out_channels=1, params=g_params, apply_fn=gen.apply)
state = jax.jit(lambda s: init_train_state(jax.random.key(s), G, S, R, cfg),
                out_shardings=rep)(1)
key = jax.jit(lambda s: jax.random.key(s), out_shardings=rep)(2)
step = make_train_step(G, S, R, cfg, mesh=mesh, donate=False)
for it in (1, 2):
    state, metrics = step(state, g_params, key, it)
print('METRICS', json.dumps({{k: float(v) for k, v in metrics.items()}}))
"""


def test_cross_process_train_step_matches_single(tmp_path):
    """The FULL train step on a 2-process x 2-device global mesh must
    reproduce the single-device run's metrics: the sample stream is a pure
    function of (seed, iteration), so cross-process DP-sharded SPMD — with its
    DCN gradient all-reduce — is numerically equivalent up to reduction
    order."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER.format(port=port))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    metrics = []
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
        line = [ln for ln in outs[i].splitlines() if ln.startswith("METRICS ")]
        assert line, f"proc {i} printed no metrics:\n{outs[i]}"
        metrics.append(json.loads(line[-1][len("METRICS "):]))

    # Single-device run of the identical seeds in THIS process.
    import jax

    from warpedganspace_tpu.models.api import GeneratorBundle
    from warpedganspace_tpu.models.reconstructor import Reconstructor
    from warpedganspace_tpu.models.sngan import SNGANGenerator
    from warpedganspace_tpu.models.support_sets import SupportSets
    from warpedganspace_tpu.train import (
        TrainStepConfig, init_train_state, make_train_step)

    gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    K = 2
    S = SupportSets(num_support_sets=K, num_support_dipoles=2,
                    support_vectors_dim=gen.dim_z, learn_gammas=True)
    R = Reconstructor("LeNet", dim=K, channels=1)
    cfg = TrainStepConfig(batch_size=8, num_support_sets=K,
                          min_shift_magnitude=0.15, max_shift_magnitude=0.25)
    g_params = gen.init(jax.random.key(0))
    G = GeneratorBundle(name="SNGAN_MNIST", dim_z=gen.dim_z, resolution=32,
                        out_channels=1, params=g_params, apply_fn=gen.apply)
    state = init_train_state(jax.random.key(1), G, S, R, cfg)
    key = jax.random.key(2)
    step = make_train_step(G, S, R, cfg, mesh=None, donate=False)
    for it in (1, 2):
        state, m = step(state, g_params, key, it)
    single = {k: float(v) for k, v in m.items()}

    for i, got in enumerate(metrics):
        for k, v in single.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-4, atol=1e-5,
                                       err_msg=f"proc {i} metric {k}")
