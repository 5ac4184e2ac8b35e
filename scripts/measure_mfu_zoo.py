#!/usr/bin/env python
"""Current-state MFU / roofline table across the zoo (PERFORMANCE.md of record).

One row per headline workload at its production configuration: wall time
(deep-pipelined best-of-3), XLA cost-model FLOPs + bytes accessed, achieved
TFLOP/s, % of bf16 peak, and % of the HBM roofline — the binding constraint
is whichever is higher. Graphs containing Pallas kernels undercount FLOPs in
the cost model (XLA cannot see inside a custom call), so their binding number
is the HBM %; the MFU column is marked ">=".

Run from the repo root: ``python scripts/measure_mfu_zoo.py [row ...]``
(rows: sg2render sg2train pgrender pgtrain bgrender bgtrain sngan).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.perf_counter()
V5E_PEAK_BF16 = 197e12   # nominal chip peak: the MFU denominator
# Measured effective ceiling on THIS chip via the axon tunnel (round 5,
# scripts/calibrate_mfu.py slope method: pure 8192^3 bf16 matmul 178.5-185.4
# TFLOP/s over 4 trials; hand-counted plain 3x3 conv 172.8). "ceil" column =
# achieved/ceiling — how much measured headroom a row really has. The
# round-3/4 "116 TFLOP/s probe" was a fixed-chain measurement that buried
# ~25 ms of tunnel dispatch in a 74 ms program; it never contradicted the
# MFU rows.
from bench import EXPECTED_PROBE_TFLOPS
MEASURED_CEILING = EXPECTED_PROBE_TFLOPS * 1e12  # single source: bench.py's slope-probe calibration (scripts/calibrate_mfu.py, round 5)
HBM_GBS = 819e9


def log(m):
    print(f"[mfu-zoo +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps=None, rounds=3, target_window=2.5):
    """Best-of-`rounds` per-call time over deep dispatch windows.

    Each window pays ONE ~25 ms tunnel sync (scripts/calibrate_mfu.py's
    fitted intercept), so per-call bias = 25 ms / (reps * t_call). reps is
    auto-scaled so the window is >= target_window (2.5 s = 100x the RTT ->
    bias < 1% for any call >= ~6.3 ms; slower calls bound it even tighter,
    and every zoo row is >= ~15 ms). The floor of 3 keeps multi-second train
    steps cheap (25 ms / 3 s < 1% already); the 400 cap bounds a pathological
    auto-estimate. The round-4 zoo's fixed shallow windows (reps 3-20)
    inflated short rows by up to ~8% (e.g. BigGAN render 16.4 vs 15.0 ms
    true).
    """
    sync(fn(*args))
    if reps is None:
        t0 = time.perf_counter()
        sync(fn(*args))
        t1 = time.perf_counter() - t0          # one call incl. the sync RTT
        reps = max(3, min(400, round(target_window / max(t1 - 0.025, 1e-4))))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def row(name, fn, args, unit_count, unit="img", reps=None, pallas=False):
    jfn = jax.jit(fn)
    c = jfn.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca["flops"])
    by = float(ca.get("bytes accessed", 0.0))
    t = timed(jfn, args, reps=reps)
    mfu = fl / t / V5E_PEAK_BF16
    ceil = fl / t / MEASURED_CEILING
    hbm = by / t / HBM_GBS
    ge = ">=" if pallas else ""
    log(f"{name}: {t * 1e3:7.1f} ms -> {unit_count / t:8.1f} {unit}/s | "
        f"{fl / t / 1e12:6.1f} TFLOP/s = {ge}{100 * mfu:5.1f}% MFU "
        f"({ge}{100 * ceil:5.1f}% of measured ceiling) | "
        f"HBM {ge}{100 * hbm:5.1f}% | binding {max(mfu, hbm) * 100:.1f}%")
    return t


from warpedganspace_tpu.models.api import GeneratorBundle, cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.biggan import BigGANGenerator  # noqa: E402
from warpedganspace_tpu.models.proggan import ProgGANGenerator  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.sngan import SNGANGenerator  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.train import (  # noqa: E402
    TrainStepConfig, init_train_state, make_train_step, make_train_step_scan)

key = jax.random.key(0)
which = set(sys.argv[1:]) or {"sg2render", "sg2train", "pgrender", "pgtrain",
                              "bgrender", "bgtrain", "sngan"}

if "sg2render" in which:
    gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True,
                             tail_layout="foldx")
    p16 = cast_params_bf16(jax.jit(gen.init)(key))
    w = jax.random.normal(jax.random.key(1), (96, 512), jnp.bfloat16)
    sh = jnp.zeros((96, 512), jnp.bfloat16)
    row("StyleGAN2-1024 render foldx B=96 bf16",
        lambda p, w, s: gen.apply(p, w, s, latent_is_w=True), (p16, w, sh), 96)

if "sg2train" in which:
    gen_t = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
    params = jax.jit(gen_t.init)(key)
    G = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=1024,
                        out_channels=3, params=params, apply_fn=gen_t.apply,
                        get_w_fn=gen_t.get_w, shift_in_w_space=True,
                        supports_s2d_out=True)
    S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    R = Reconstructor("ResNet", dim=200, channels=3)
    cfg = TrainStepConfig(batch_size=12, num_support_sets=200,
                          min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                          z_truncation=0.7, shift_in_w_space=True,
                          generator_dtype="bfloat16", reconstructor_dtype="bfloat16",
                          pair_layout="s2d")
    state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
    step = make_train_step(G, S, R, cfg, donate=False)
    row("StyleGAN2-1024 train bs12 prod", lambda st, gp, k, i: step(st, gp, k, i),
        (state, G.params, key, 1), 1, unit="step")

sg2_bs_rows = sorted(int(w.split("sg2train", 1)[1]) for w in which
                     if w.startswith("sg2train") and w != "sg2train")
for bs in sg2_bs_rows:
    # The one single-chip train lever left after the round-3 head-fusion
    # negative: larger batch at the reference's other hyperparameters.
    # no-remat first (bs12 uses ~14 of 16 GB — larger may not fit); on
    # RESOURCE_EXHAUSTED fall back to remat="tail" (the round-2 winner when
    # memory binds). Compare samples/s, not steps/s. Round-4 result: bs16
    # no-remat FITS and runs the SAME 221.5 ms as bs12 -> 72.2 samples/s
    # (+32% free — the bs12 step is occupancy-limited, not HBM-limited).
    for remat in (False, "tail"):
        try:
            gen_t = StyleGAN2Generator(resolution=1024, shift_in_w_space=True,
                                       remat=remat)
            params = jax.jit(gen_t.init)(key)
            G = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=1024,
                                out_channels=3, params=params, apply_fn=gen_t.apply,
                                get_w_fn=gen_t.get_w, shift_in_w_space=True,
                                supports_s2d_out=True)
            S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                            support_vectors_dim=512, learn_gammas=True)
            R = Reconstructor("ResNet", dim=200, channels=3)
            cfg = TrainStepConfig(batch_size=bs, num_support_sets=200,
                                  min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                                  z_truncation=0.7, shift_in_w_space=True,
                                  generator_dtype="bfloat16",
                                  reconstructor_dtype="bfloat16",
                                  pair_layout="s2d")
            state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
            step = make_train_step(G, S, R, cfg, donate=False)
            t = row(f"StyleGAN2-1024 train bs{bs} remat={remat}",
                    lambda st, gp, k, i: step(st, gp, k, i),
                    (state, G.params, key, 1), 1, unit="step")
            log(f"  -> {bs / t:.1f} samples/s (bs12 prod reference: "
                f"4.57 steps/s = 54.8 samples/s)")
            break
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            log(f"StyleGAN2-1024 train bs{bs} remat={remat}: FAILED ({msg})")

if "pgrender" in which:
    pgen = ProgGANGenerator(tail_layout="pallas")
    pg16 = cast_params_bf16(jax.jit(pgen.init)(key))
    pz = jax.random.normal(jax.random.key(2), (48, 512), jnp.bfloat16)
    row("ProgGAN-1024 render pallas B=48 bf16",
        lambda p, z: pgen.apply(p, z), (pg16, pz), 48, pallas=True)

pg_bs_rows = ([8] if "pgtrain" in which else []) + sorted(
    int(w.split("pgtrain", 1)[1]) for w in which
    if w.startswith("pgtrain") and w != "pgtrain")
for bs in pg_bs_rows:
    try:
        pgen_t = ProgGANGenerator()
        PG = GeneratorBundle(name="ProgGAN", dim_z=512, resolution=1024,
                             out_channels=3, params=jax.jit(pgen_t.init)(key),
                             apply_fn=pgen_t.apply, supports_s2d_out=True)
        S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                        support_vectors_dim=512, learn_gammas=True)
        R = Reconstructor("ResNet", dim=200, channels=3)
        cfg = TrainStepConfig(batch_size=bs, num_support_sets=200,
                              min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                              generator_dtype="bfloat16", reconstructor_dtype="bfloat16",
                              pair_layout="s2d")
        state = jax.jit(lambda k: init_train_state(k, PG, S, R, cfg))(key)
        step = make_train_step(PG, S, R, cfg, donate=False)
        t = row(f"ProgGAN-1024 train bs{bs} prod", lambda st, gp, k, i: step(st, gp, k, i),
                (state, PG.params, key, 1), 1, unit="step")
        if bs != 8:
            log(f"  -> {bs / t:.1f} samples/s (bs8 prod reference: "
                f"8.5 steps/s = 68 samples/s)")
    except Exception as e:
        log(f"ProgGAN-1024 train bs{bs}: FAILED ({str(e).splitlines()[0][:160]})")

if "bgrender" in which:
    bgen = BigGANGenerator.from_config(target_classes=(239,))
    bg16 = cast_params_bf16(jax.jit(bgen.init)(key))
    bz = jax.random.normal(jax.random.key(3), (64, bgen.dim_z), jnp.bfloat16)
    row("BigGAN-128 render B=64 bf16", lambda p, z: bgen.apply(p, z),
        (bg16, bz), 64, pallas=True)

bg_bs_rows = ([32] if "bgtrain" in which else []) + sorted(
    int(w.split("bgtrain", 1)[1]) for w in which
    if w.startswith("bgtrain") and w != "bgtrain")
for bs in bg_bs_rows:
    try:
        bgen_t = BigGANGenerator.from_config(target_classes=(239,))
        BG = GeneratorBundle(name="BigGAN", dim_z=bgen_t.dim_z, resolution=128,
                             out_channels=3, params=jax.jit(bgen_t.init)(key),
                             apply_fn=bgen_t.apply)
        S = SupportSets(num_support_sets=120, num_support_dipoles=256,
                        support_vectors_dim=BG.dim_z, learn_gammas=True)
        R = Reconstructor("ResNet", dim=120, channels=3)
        cfg = TrainStepConfig(batch_size=bs, num_support_sets=120,
                              min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                              generator_dtype="bfloat16", reconstructor_dtype="bfloat16")
        state = jax.jit(lambda k: init_train_state(k, BG, S, R, cfg))(key)
        step = make_train_step(BG, S, R, cfg, donate=False)
        t = row(f"BigGAN-128 train bs{bs} prod", lambda st, gp, k, i: step(st, gp, k, i),
                (state, BG.params, key, 1), 1, unit="step", pallas=True)
        if bs != 32:
            log(f"  -> {bs / t:.1f} samples/s (bs32 prod reference: "
                f"33.8 steps/s = 1082 samples/s)")
    except Exception as e:
        log(f"BigGAN-128 train bs{bs}: FAILED ({str(e).splitlines()[0][:160]})")

sn_bs_rows = ([128] if "sngan" in which else []) + sorted(
    int(w.split("sngan", 1)[1]) for w in which
    if w.startswith("sngan") and w != "sngan")
for bs in sn_bs_rows:
    for gan_type, channels, rec, eps in (
            ("SNGAN_MNIST", 1, "LeNet", (0.15, 0.25)),
            ("SNGAN_AnimeFaces", 3, "LeNet", (0.25, 0.35))):
        if bs != 128 and gan_type != "SNGAN_MNIST":
            continue  # non-reference batch sweep: MNIST row only
        sgen = SNGANGenerator.from_gan_type(gan_type)
        G = GeneratorBundle(name=gan_type, dim_z=sgen.dim_z,
                            resolution=sgen.img_size, out_channels=channels,
                            params=jax.jit(sgen.init)(key), apply_fn=sgen.apply)
        S = SupportSets(num_support_sets=64, num_support_dipoles=128,
                        support_vectors_dim=sgen.dim_z, learn_gammas=True)
        R = Reconstructor(rec, dim=64, channels=channels)
        cfg = TrainStepConfig(batch_size=bs, num_support_sets=64,
                              min_shift_magnitude=eps[0], max_shift_magnitude=eps[1],
                              generator_dtype="bfloat16")
        state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
        step16 = make_train_step_scan(G, S, R, cfg, k=16, donate=False)
        t = row(f"{gan_type} train bs{bs} scan16",
                lambda st, gp, k, i: step16(st, gp, k, i),
                (state, G.params, key, 1), 16, unit="step")
        if bs != 128:
            log(f"  -> {16 * bs / t:.0f} samples/s (bs128 reference: "
                f"160 steps/s = 20500 samples/s)")
