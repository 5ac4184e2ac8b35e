#!/usr/bin/env python
"""ProgGAN train-step part attribution at the production flag set (bs=8).

Where do the ~115 ms of a ProgGAN-1024 production train step go?  Times, on
the real chip: (a) the full step, (b) one frozen G forward (s2d out, bf16 —
the un-shifted image, which autodiff already leaves backward-free), (c) the
shifted G forward *with* backward w.r.t. the shift (the only G backward the
step contains), (d) the reconstructor pair fwd+bwd, (e) the warp.  The sum
over-counts shared fusion wins, so parts are an upper bound on their share.

Run from the repo root: ``python scripts/measure_proggan_train_parts.py``.
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from warpedganspace_tpu.models.api import GeneratorBundle, cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.proggan import ProgGANGenerator  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.train import TrainStepConfig, init_train_state, make_train_step  # noqa: E402

T0 = time.perf_counter()


def log(m):
    print(f"[pg-parts +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


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


BS = 8
key = jax.random.key(0)
gen = ProgGANGenerator(remat=False)
g_params_f32 = jax.jit(gen.init)(key)
g_params = cast_params_bf16(g_params_f32)
S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                support_vectors_dim=512, learn_gammas=True)
R = Reconstructor("ResNet", dim=200, channels=3)
G = GeneratorBundle(name="ProgGAN", dim_z=512, resolution=1024, out_channels=3,
                    params=g_params_f32, apply_fn=gen.apply, supports_s2d_out=True)
cfg = TrainStepConfig(batch_size=BS, num_support_sets=200,
                      min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                      generator_dtype="bfloat16", reconstructor_dtype="bfloat16",
                      pair_layout="s2d")
state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
step = make_train_step(G, S, R, cfg, donate=False)
log("compiling full step...")
t_full = timed(step, (state, g_params_f32, key, 1))
log(f"full step: {t_full*1e3:.1f} ms -> {1/t_full:.2f} steps/s")

z = jax.random.normal(key, (BS, 512), jnp.bfloat16)
shift = jax.random.normal(key, (BS, 512), jnp.bfloat16) * 0.15

fwd = jax.jit(lambda p, z: gen.apply(p, z, out_layout="s2d"))
log("compiling G fwd...")
t_fwd = timed(fwd, (g_params, z))
log(f"G fwd (s2d, bf16, bs{BS}): {t_fwd*1e3:.1f} ms")


def shifted_loss(sh, p, z):
    img = gen.apply(p, z, sh, out_layout="s2d")
    return jnp.sum(img.astype(jnp.float32))


fwdbwd = jax.jit(jax.grad(shifted_loss))
log("compiling G fwd+bwd (wrt shift)...")
t_fb = timed(fwdbwd, (shift, g_params, z))
log(f"G fwd+bwd wrt shift: {t_fb*1e3:.1f} ms")

img = fwd(g_params, z)
r_params = state["r_params"]


def r_loss(rp, a, b):
    logits, mag_hat, _ = R.apply_pair_s2d(rp, a, b, train=True, dtype=jnp.bfloat16)
    return jnp.sum(logits.astype(jnp.float32)) + jnp.sum(mag_hat.astype(jnp.float32))


r_fb = jax.jit(jax.grad(r_loss))
log("compiling R pair fwd+bwd...")
t_r = timed(r_fb, (r_params, img, img))
log(f"R pair fwd+bwd (bf16, bs{BS}): {t_r*1e3:.1f} ms")

s_params = state["s_params"]
idx = jnp.zeros((BS,), jnp.int32)
warp = jax.jit(jax.grad(lambda sp, lat: jnp.sum(S.direction(sp, lat, idx))))
lat = jax.random.normal(key, (BS, 512), jnp.float32)
log("compiling warp fwd+bwd...")
t_w = timed(warp, (s_params, lat))
log(f"warp fwd+bwd: {t_w*1e3:.1f} ms")

parts = t_fwd + t_fb + t_r + t_w
log(f"sum of parts {parts*1e3:.1f} ms vs full {t_full*1e3:.1f} ms "
    f"(overhead/overlap {100*(t_full-parts)/t_full:+.1f}%)")
