#!/usr/bin/env python
"""Train-step throughput for every reference training config (PERFORMANCE.md).

Measures one jitted step per config on the local chip, with the production
flag set next to the f32 baseline, so the launcher-flag choices stay backed by
numbers. Run from the repo root: ``python scripts/measure_train_steps.py``
(add the repo to PYTHONPATH by *prepending* — the TPU plugin registers via
sitecustomize).
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from warpedganspace_tpu.models.api import GeneratorBundle  # noqa: E402
from warpedganspace_tpu.models.biggan import BigGANGenerator  # noqa: E402
from warpedganspace_tpu.models.proggan import ProgGANGenerator  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.sngan import SNGANGenerator  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.train import (  # noqa: E402
    TrainStepConfig,
    init_train_state,
    make_train_step,
)

T0 = time.perf_counter()


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    # axon: block_until_ready can return early; device-get a reduction.
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(fn, args, reps=10, rounds=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def measure(name, G, S, R, base_cfg, flag_sets, reps=10):
    key = jax.random.key(0)
    for label, extra in flag_sets:
        cfg = TrainStepConfig(**{**base_cfg, **extra})
        state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
        step = make_train_step(G, S, R, cfg, donate=False)
        log(f"compiling {name} [{label}]...")
        t = timed(lambda st, gp, k, i: step(st, gp, k, i),
                  (state, G.params, key, 1), reps=reps)
        log(f"{name} [{label}]: {t * 1e3:.1f} ms -> {1 / t:.2f} steps/s")


PROD = {"generator_dtype": "bfloat16", "reconstructor_dtype": "bfloat16",
        "pair_layout": "s2d"}
MIXED = {"generator_dtype": "bfloat16", "reconstructor_dtype": "bfloat16"}

key = jax.random.key(0)
which = set(sys.argv[1:]) or {"stylegan2", "proggan", "biggan", "anime", "mnist"}

if "stylegan2" in which:
    S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    R = Reconstructor("ResNet", dim=200, channels=3)
    # f32 needs remat to fit 16 GB; the production bf16/s2d config does not.
    for label, remat, extra in (("f32 tail-remat", "tail", {}),
                                ("production no-remat", False, PROD)):
        gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True,
                                 remat=remat)
        G = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=1024,
                            out_channels=3, params=jax.jit(gen.init)(key),
                            apply_fn=gen.apply, get_w_fn=gen.get_w,
                            shift_in_w_space=True, supports_s2d_out=True)
        measure("StyleGAN2-1024 W bs12", G, S, R,
                dict(batch_size=12, num_support_sets=200, min_shift_magnitude=0.1,
                     max_shift_magnitude=0.2, z_truncation=0.7,
                     shift_in_w_space=True),
                [(label, extra)])

if "proggan" in which:
    S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    R = Reconstructor("ResNet", dim=200, channels=3)
    for label, remat, extra in (("f32 tail-remat", "tail", {}),
                                ("production no-remat", False, PROD)):
        gen = ProgGANGenerator(remat=remat)
        G = GeneratorBundle(name="ProgGAN", dim_z=512, resolution=1024,
                            out_channels=3, params=jax.jit(gen.init)(key),
                            apply_fn=gen.apply, supports_s2d_out=True)
        measure("ProgGAN-1024 bs8", G, S, R,
                dict(batch_size=8, num_support_sets=200, min_shift_magnitude=0.1,
                     max_shift_magnitude=0.2),
                [(label, extra)])

if "biggan" in which:
    gen = BigGANGenerator.from_config(target_classes=(239,))
    G = GeneratorBundle(name="BigGAN", dim_z=gen.dim_z, resolution=128,
                        out_channels=3, params=jax.jit(gen.init)(key),
                        apply_fn=gen.apply)
    S = SupportSets(num_support_sets=120, num_support_dipoles=256,
                    support_vectors_dim=gen.dim_z, learn_gammas=True)
    R = Reconstructor("ResNet", dim=120, channels=3)
    measure("BigGAN-239 bs32", G, S, R,
            dict(batch_size=32, num_support_sets=120, min_shift_magnitude=0.1,
                 max_shift_magnitude=0.2),
            [("f32", {}), ("bf16 G/R", MIXED)])

if "anime" in which:
    gen = SNGANGenerator.from_gan_type("SNGAN_AnimeFaces")
    G = GeneratorBundle(name="SNGAN_AnimeFaces", dim_z=gen.dim_z, resolution=64,
                        out_channels=3, params=jax.jit(gen.init)(key),
                        apply_fn=gen.apply)
    S = SupportSets(num_support_sets=64, num_support_dipoles=128,
                    support_vectors_dim=gen.dim_z, learn_gammas=True)
    R = Reconstructor("LeNet", dim=64, channels=3)
    measure("SNGAN-Anime bs128", G, S, R,
            dict(batch_size=128, num_support_sets=64, min_shift_magnitude=0.25,
                 max_shift_magnitude=0.35),
            [("f32", {}), ("bf16 G", {"generator_dtype": "bfloat16"})], reps=20)

if "mnist" in which:
    gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    G = GeneratorBundle(name="SNGAN_MNIST", dim_z=gen.dim_z, resolution=32,
                        out_channels=1, params=jax.jit(gen.init)(key),
                        apply_fn=gen.apply)
    S = SupportSets(num_support_sets=64, num_support_dipoles=128,
                    support_vectors_dim=gen.dim_z, learn_gammas=True)
    R = Reconstructor("LeNet", dim=64, channels=1)
    measure("SNGAN-MNIST bs128", G, S, R,
            dict(batch_size=128, num_support_sets=64, min_shift_magnitude=0.15,
                 max_shift_magnitude=0.25),
            [("f32", {}), ("bf16 G", {"generator_dtype": "bfloat16"})], reps=20)
