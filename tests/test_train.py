"""Training subsystem tests: step correctness, DP equivalence, Trainer E2E."""
import json
import os.path as osp
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpedganspace_tpu.models.api import GeneratorBundle
from warpedganspace_tpu.models.reconstructor import Reconstructor
from warpedganspace_tpu.models.sngan import SNGANGenerator
from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.parallel import make_mesh
from warpedganspace_tpu.train import (
    TrainStepConfig,
    Trainer,
    init_train_state,
    make_train_step,
)


def _tiny_setup(batch_size=8, K=4):
    gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    g_params = gen.init(jax.random.key(0))
    G = GeneratorBundle(
        name="SNGAN_MNIST",
        dim_z=gen.dim_z,
        resolution=32,
        out_channels=1,
        params=g_params,
        apply_fn=gen.apply,
    )
    S = SupportSets(num_support_sets=K, num_support_dipoles=2, support_vectors_dim=gen.dim_z)
    R = Reconstructor("LeNet", dim=K, channels=1)
    cfg = TrainStepConfig(
        batch_size=batch_size,
        num_support_sets=K,
        min_shift_magnitude=0.15,
        max_shift_magnitude=0.25,
    )
    return G, S, R, cfg


def test_train_step_runs_and_learns():
    G, S, R, cfg = _tiny_setup()
    key = jax.random.key(1)
    state = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg, donate=False)

    s0 = state["s_params"]["support_sets"]
    alphas0 = state["s_params"]["alphas"]
    state2, metrics = step(state, G.params, key, 1)

    for k in ("accuracy", "classification_loss", "regression_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    # Support vectors must move; frozen alphas must not.
    assert float(jnp.abs(state2["s_params"]["support_sets"] - s0).max()) > 0
    np.testing.assert_array_equal(state2["s_params"]["alphas"], alphas0)
    # Reconstructor BN stats must have been refreshed.
    assert float(jnp.abs(state2["r_params"]["bn1"]["mean"]).max()) > 0


def test_train_step_loss_decreases():
    """Stepping repeatedly on one fixed batch (same iteration -> same RNG fold)
    must overfit it — validates the full grad path through frozen G into S/R."""
    G, S, R, cfg = _tiny_setup()
    cfg = TrainStepConfig(**{**cfg.__dict__, "support_set_lr": 3e-3, "reconstructor_lr": 3e-3})
    key = jax.random.key(2)
    state = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg)
    losses = []
    for _ in range(40):
        state, metrics = step(state, G.params, key, 1)
        losses.append(float(metrics["total_loss"]))
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])


def test_data_parallel_step_matches_single_device():
    """SPMD-sharded step == single-device step on the same batch (SURVEY §4)."""
    G, S, R, cfg = _tiny_setup(batch_size=16)
    key = jax.random.key(3)
    state1 = init_train_state(key, G, S, R, cfg)
    state2 = jax.tree_util.tree_map(lambda x: x.copy(), state1)

    step_single = make_train_step(G, S, R, cfg, mesh=None, donate=False)
    mesh = make_mesh()
    step_dp = make_train_step(G, S, R, cfg, mesh=mesh, donate=False)

    out1, m1 = step_single(state1, G.params, key, 1)
    out2, m2 = step_dp(state2, G.params, key, 1)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        out1["s_params"]["support_sets"], out2["s_params"]["support_sets"], rtol=1e-4, atol=1e-6
    )


def _trainer_params(tmp, max_iter=4):
    return types.SimpleNamespace(
        gan_type="SNGAN_MNIST",
        reconstructor_type="LeNet",
        num_support_sets=4,
        num_support_dipoles=2,
        min_shift_magnitude=0.15,
        max_shift_magnitude=0.25,
        lambda_cls=1.0,
        lambda_reg=0.25,
        support_set_lr=1e-4,
        reconstructor_lr=1e-4,
        batch_size=4,
        max_iter=max_iter,
        log_freq=2,
        ckp_freq=2,
        tensorboard=False,
        z_truncation=None,
        shift_in_w_space=False,
        learn_alphas=False,
        learn_gammas=False,
        gamma=None,
    )


def test_trainer_end_to_end(tmp_path, capsys):
    G, S, R, _ = _tiny_setup(batch_size=4)
    p = _trainer_params(tmp_path)
    root = str(tmp_path / "experiments")
    trn = Trainer(params=p, exp_dir="test-exp", root=root)
    trn.train(G, S, R)

    wip = osp.join(root, "wip", "test-exp")
    complete = osp.join(root, "complete", "test-exp")
    assert osp.isfile(osp.join(wip, "models", "support_sets_init.pt"))
    assert osp.isfile(osp.join(wip, "models", "support_sets.pt"))
    assert osp.isfile(osp.join(wip, "models", "reconstructor.pt"))
    assert osp.isfile(osp.join(wip, "models", "checkpoint.pt"))
    # Completed run copied without checkpoint.pt (reference trainer.py:302-319).
    assert osp.isfile(osp.join(complete, "models", "support_sets.pt"))
    assert not osp.isfile(osp.join(complete, "models", "checkpoint.pt"))
    with open(osp.join(wip, "stats.json")) as f:
        stats = json.load(f)
    assert set(stats) == {"2", "4"}
    assert set(stats["4"]) == {
        "accuracy",
        "classification_loss",
        "regression_loss",
        "total_loss",
    }

    # Checkpoint round-trips through the reference torch format.
    from warpedganspace_tpu.utils.io import load_pt

    ckpt = load_pt(osp.join(wip, "models", "checkpoint.pt"))
    assert ckpt["iter"] == 4
    assert "SUPPORT_SETS" in ckpt["support_sets"]
    assert ckpt["support_sets"]["SUPPORT_SETS"].shape == (4, 2 * 2 * 128)


def test_trainer_resume_completed_exits(tmp_path):
    G, S, R, _ = _tiny_setup(batch_size=4)
    p = _trainer_params(tmp_path)
    root = str(tmp_path / "experiments")
    Trainer(params=p, exp_dir="exp2", root=root).train(G, S, R)
    # Re-running a completed experiment exits early (reference trainer.py:169-177).
    with pytest.raises(SystemExit):
        Trainer(params=p, exp_dir="exp2", root=root).train(G, S, R)


def test_bf16_generator_training():
    """bf16-G training runs, stays finite, and tracks the f32 loss closely."""
    G, S, R, cfg = _tiny_setup()
    cfg16 = TrainStepConfig(**{**cfg.__dict__, "generator_dtype": "bfloat16"})
    key = jax.random.key(9)
    s32 = init_train_state(key, G, S, R, cfg)
    s16 = jax.tree_util.tree_map(lambda x: x.copy(), s32)
    step32 = make_train_step(G, S, R, cfg, donate=False)
    step16 = make_train_step(G, S, R, cfg16, donate=False)
    _, m32 = step32(s32, G.params, key, 1)
    _, m16 = step16(s16, G.params, key, 1)
    assert np.isfinite(float(m16["total_loss"]))
    np.testing.assert_allclose(
        float(m16["total_loss"]), float(m32["total_loss"]), rtol=0.05
    )


def test_trainer_mid_training_resume(tmp_path, capsys):
    """A checkpoint written mid-run is picked up: training resumes at
    checkpoint iter (reference trainer.py:74-89) and continues to max_iter,
    with optimizer state restored from the sidecar."""
    G, S, R, cfg = _tiny_setup(batch_size=4)
    p = _trainer_params(tmp_path, max_iter=6)
    root = str(tmp_path / "experiments")

    # Plant a checkpoint at iteration 3 (as if a previous run died there).
    trn = Trainer(params=p, exp_dir="exp3", root=root)
    key = jax.random.key(trn.seed)
    state = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg, donate=False)
    for it in range(1, 4):
        state, _ = step(state, G.params, key, it)
    trn.save_checkpoint(3, S, state)
    planted = np.asarray(state["s_params"]["support_sets"])

    # Fresh Trainer resumes from the checkpoint and finishes.
    trn2 = Trainer(params=p, exp_dir="exp3", root=root)
    final_state = trn2.train(G, S, R)
    out = capsys.readouterr().out
    assert "Start training from iteration 3" in out
    # Parameters moved on from the planted checkpoint (iterations 3..6 ran).
    assert float(np.abs(np.asarray(final_state["s_params"]["support_sets"]) - planted).max()) > 0


def test_trainer_orbax_backend_resume(tmp_path, capsys):
    """--checkpoint-backend orbax: mid-run checkpoint resumes EXACTLY
    (params + optimizer state restored bit-for-bit, no torch format in the
    loop), completed copy excludes the orbax dir like checkpoint.pt."""
    pytest.importorskip("orbax.checkpoint")
    G, S, R, cfg = _tiny_setup(batch_size=4)
    p = _trainer_params(tmp_path, max_iter=6)
    p.checkpoint_backend = "orbax"
    root = str(tmp_path / "experiments")

    trn = Trainer(params=p, exp_dir="exp-orbax", root=root)
    key = jax.random.key(trn.seed)
    state = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg, donate=False)
    for it in range(1, 4):
        state, _ = step(state, G.params, key, it)
    trn.save_checkpoint(3, S, state)

    trn2 = Trainer(params=p, exp_dir="exp-orbax", root=root)
    start, restored = trn2.get_starting_iteration(S, init_train_state(key, G, S, R, cfg))
    assert start == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trn3 = Trainer(params=p, exp_dir="exp-orbax", root=root)
    trn3.train(G, S, R)
    out = capsys.readouterr().out
    assert "Start training from iteration 3" in out
    wip = osp.join(root, "wip", "exp-orbax")
    complete = osp.join(root, "complete", "exp-orbax")
    assert osp.isdir(osp.join(wip, "models", "orbax"))
    assert osp.isfile(osp.join(complete, "models", "support_sets.pt"))
    assert not osp.isdir(osp.join(complete, "models", "orbax"))
    assert not osp.isfile(osp.join(complete, "models", "checkpoint.pt"))


def test_tensorboard_scalars_written(tmp_path, monkeypatch):
    """--tensorboard writes per-iteration event files (reference parity:
    lib/trainer.py:55-63 + :242-247); --no-tensorboard-server suppresses the
    in-process server (a deviation flag; the reference always launches one)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WGS_ALLOW_RANDOM_G", "1")
    import glob
    import os.path as osp

    from warpedganspace_tpu.cli import train as train_cli

    train_cli.main([
        "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
        "-K", "2", "-D", "2", "--min-shift-magnitude", "0.15",
        "--max-shift-magnitude", "0.25", "--max-iter", "2", "--batch-size", "2",
        "--log-freq", "2", "--ckp-freq", "2",
        "--tensorboard", "--no-tensorboard-server",
    ])
    exp = osp.join("experiments", "complete", "SNGAN_MNIST-LeNet-K2-D2-eps0.15_0.25")
    events = glob.glob(osp.join(exp, "tensorboard", "events.out.tfevents.*"))
    assert events, "no TensorBoard event files written"


def test_train_step_bf16_reconstructor_learns():
    """--r-dtype bfloat16: the step runs, S/R still learn, metrics are f32."""
    G, S, R, cfg = _tiny_setup()
    cfg = TrainStepConfig(**{
        **cfg.__dict__,
        "reconstructor_dtype": "bfloat16",
        "support_set_lr": 3e-3,
        "reconstructor_lr": 3e-3,
    })
    key = jax.random.key(7)
    state = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg)
    losses = []
    for _ in range(40):
        state, metrics = step(state, G.params, key, 1)
        losses.append(float(metrics["total_loss"]))
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])
    for leaf in jax.tree_util.tree_leaves(state["r_params"]):
        assert leaf.dtype == jnp.float32


def test_train_step_pair_s2d_matches_nhwc():
    """pair_layout='s2d' (G hands R the S2D tail tensor directly) produces the
    same step as the NHWC handoff — metrics and updated params match."""
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1,
                             shift_in_w_space=True)
    g_params = gen.init(jax.random.key(0))
    G = GeneratorBundle(
        name="StyleGAN2", dim_z=512, resolution=256, out_channels=3,
        params=g_params, apply_fn=gen.apply, get_w_fn=gen.get_w,
        shift_in_w_space=True, supports_s2d_out=True,
    )
    S = SupportSets(num_support_sets=4, num_support_dipoles=2, support_vectors_dim=512)
    R = Reconstructor("ResNet", dim=4, channels=3)
    base = dict(batch_size=2, num_support_sets=4, min_shift_magnitude=0.1,
                max_shift_magnitude=0.2, shift_in_w_space=True)
    key = jax.random.key(5)

    results = {}
    for layout in ("nhwc", "s2d"):
        cfg = TrainStepConfig(**base, pair_layout=layout)
        state = init_train_state(key, G, S, R, cfg)
        step = make_train_step(G, S, R, cfg, donate=False)
        new_state, metrics = step(state, G.params, key, 1)
        results[layout] = (new_state, metrics)

    m_a, m_b = results["nhwc"][1], results["s2d"][1]
    for k in m_a:
        np.testing.assert_allclose(float(m_b[k]), float(m_a[k]), rtol=1e-4, atol=1e-5)
    # Adam normalizes near-zero grads to ~sign(g)*lr, so float-reassociation
    # jitter can flip a handful of tiny elements by up to ~2*lr; bound the
    # params absolutely (metrics above already pin the math at rtol 1e-4).
    for part in ("s_params", "r_params"):
        la = jax.tree_util.tree_leaves(results["nhwc"][0][part])
        lb = jax.tree_util.tree_leaves(results["s2d"][0][part])
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(b, a, rtol=0, atol=5e-4)


def test_trainer_profile_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace directory (SURVEY §5 tracing)."""
    import os

    G, S, R, _ = _tiny_setup(batch_size=4)
    p = _trainer_params(tmp_path, max_iter=2)
    root = str(tmp_path / "experiments")
    trn = Trainer(params=p, exp_dir="prof-exp", root=root)
    trn.train(G, S, R, profile=True)
    prof_dir = osp.join(root, "wip", "prof-exp", "profile")
    assert osp.isdir(prof_dir)
    found = [f for _, _, fs in os.walk(prof_dir) for f in fs]
    assert found, "profiler trace directory is empty"


def test_train_step_scan_matches_single_steps():
    """k-step lax.scan chunking (make_train_step_scan) reproduces k
    individual step() calls: same sample stream (pure function of (seed,
    iteration)), same final state, per-iteration metrics stacked in order.
    Numerics match up to XLA fusion/reduction-order differences between the
    scanned body and the standalone step program. For R's params that bound
    is a few lr units: early Adam updates are sign-like (g/sqrt(g^2) = ±1),
    so a 1e-7 reduction-noise sign flip on a near-zero grad moves a weight by
     2*lr — per-iteration METRICS matching at 1e-5 is the semantic check."""
    from warpedganspace_tpu.train import make_train_step_scan

    G, S, R, cfg = _tiny_setup()
    key = jax.random.key(1)
    k = 4

    state1 = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg, donate=False)
    singles = []
    for it in range(3, 3 + k):
        state1, m = step(state1, G.params, key, it)
        singles.append({n: float(v) for n, v in m.items()})

    state2 = init_train_state(key, G, S, R, cfg)
    stepk = make_train_step_scan(G, S, R, cfg, k=k, donate=False)
    state2, mk = stepk(state2, G.params, key, 3)

    for i in range(k):
        for n, v in singles[i].items():
            np.testing.assert_allclose(float(mk[n][i]), v, rtol=1e-5, atol=1e-6,
                                       err_msg=f"iter {3 + i} metric {n}")
    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(state1["s_params"]),
                            jax.tree_util.tree_leaves(state2["s_params"])):
        np.testing.assert_allclose(np.asarray(leaf2), np.asarray(leaf1),
                                   rtol=1e-5, atol=1e-6)
    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(state1["r_params"]),
                            jax.tree_util.tree_leaves(state2["r_params"])):
        np.testing.assert_allclose(np.asarray(leaf2), np.asarray(leaf1),
                                   rtol=0, atol=2e-3)


def test_train_step_scan_under_mesh_matches_single_steps():
    """The SHIPPED launcher combination --steps-per-call x --multi-device:
    a k-step lax.scan chunk whose body is the SPMD batch-sharded step over the
    8-device mesh must reproduce k single-dispatch single-device steps (same
    sample stream, same metrics, same final support sets). This is the
    configuration scripts/train/{mnist,anime}.sh run on a pod; previously the
    scan and mesh paths were each tested only in isolation."""
    from warpedganspace_tpu.train import make_train_step_scan

    G, S, R, cfg = _tiny_setup(batch_size=16)
    key = jax.random.key(7)
    k = 4

    state1 = init_train_state(key, G, S, R, cfg)
    step = make_train_step(G, S, R, cfg, mesh=None, donate=False)
    singles = []
    for it in range(1, 1 + k):
        state1, m = step(state1, G.params, key, it)
        singles.append({n: float(v) for n, v in m.items()})

    mesh = make_mesh()
    state2 = init_train_state(key, G, S, R, cfg)
    stepk = make_train_step_scan(G, S, R, cfg, mesh=mesh, k=k, donate=False)
    state2, mk = stepk(state2, G.params, key, 1)

    for i in range(k):
        for n, v in singles[i].items():
            np.testing.assert_allclose(float(mk[n][i]), v, rtol=1e-4, atol=1e-5,
                                       err_msg=f"iter {1 + i} metric {n}")
    np.testing.assert_allclose(
        np.asarray(state2["s_params"]["support_sets"]),
        np.asarray(state1["s_params"]["support_sets"]), rtol=1e-4, atol=1e-5)
    for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(state1["r_params"]),
                            jax.tree_util.tree_leaves(state2["r_params"])):
        np.testing.assert_allclose(np.asarray(leaf2), np.asarray(leaf1),
                                   rtol=0, atol=2e-3)


def test_trainer_steps_per_call_matches_single(tmp_path):
    """Trainer with steps_per_call=2 (chunked lax.scan dispatch) reproduces
    the single-dispatch run's stats.json and final exports; a RESUMED chunked
    run (re-running the checkpoint iteration as a lone mis-phased step before
    re-chunking) also completes with the same schema."""
    G, S, R, _ = _tiny_setup(batch_size=4)

    p1 = _trainer_params(tmp_path, max_iter=4)
    root1 = str(tmp_path / "exp_single")
    Trainer(params=p1, exp_dir="e", root=root1).train(G, S, R)

    p2 = _trainer_params(tmp_path, max_iter=4)
    p2.steps_per_call = 2
    root2 = str(tmp_path / "exp_chunked")
    Trainer(params=p2, exp_dir="e", root=root2).train(G, S, R)

    s1 = json.load(open(osp.join(root1, "wip", "e", "stats.json")))
    s2 = json.load(open(osp.join(root2, "wip", "e", "stats.json")))
    assert set(s1) == set(s2) == {"2", "4"}
    for it in s1:
        for k in s1[it]:
            np.testing.assert_allclose(s2[it][k], s1[it][k], rtol=1e-4,
                                       atol=1e-5, err_msg=f"{it}[{k}]")

    # Resume the chunked run to a longer horizon: starts with the lone re-run
    # of iteration 4, then chunks [5,6], [7,8].
    p3 = _trainer_params(tmp_path, max_iter=8)
    p3.steps_per_call = 2
    Trainer(params=p3, exp_dir="e", root=root2).train(G, S, R)
    s3 = json.load(open(osp.join(root2, "wip", "e", "stats.json")))
    assert set(s3) == {"2", "4", "6", "8"}

    # Invalid divisibility fails loudly.
    p4 = _trainer_params(tmp_path, max_iter=4)
    p4.steps_per_call = 3  # does not divide log_freq=2 / ckp_freq=2
    with pytest.raises(ValueError, match="steps-per-call"):
        Trainer(params=p4, exp_dir="e2", root=str(tmp_path / "bad")).train(G, S, R)
