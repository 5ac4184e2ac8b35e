#!/usr/bin/env python
"""MFU / roofline measurement for the north-star workloads (PERFORMANCE.md).

FLOP counts come from XLA's own cost model (compiled.cost_analysis()['flops'])
— no hand-counting — and times from deep-pipelined runs on the chip.
Component attribution for the train step is measured by timing jitted
sub-graphs (G forward, both forwards, full loss forward, loss+backward),
since no trace viewer is available on this host.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.perf_counter()


def log(m):
    print(f"[mfu +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timed(fn, args, reps=30, rounds=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def flops_of(fn, args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 49e12  # bf16 peak / 4 (f32 matmuls via multi-pass on the MXU)
HBM_GBS = 819e9

from warpedganspace_tpu.models.api import GeneratorBundle  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.train import TrainStepConfig, init_train_state, make_train_step  # noqa: E402

# ---------------- render (bf16, B=96 — the headline config) -----------------
gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
params = jax.jit(gen.init)(jax.random.key(0))
p16 = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
B = 96  # throughput plateau (see bench.py sweep)
w = jax.random.normal(jax.random.key(1), (B, 512), jnp.bfloat16)
sh = jnp.zeros((B, 512), jnp.bfloat16)

render = jax.jit(lambda p, w, s: gen.apply(p, w, s, latent_is_w=True))
fl = flops_of(lambda p, w, s: gen.apply(p, w, s, latent_is_w=True), (p16, w, sh))
log(f"render bf16 flops/batch16 = {fl:.3e} ({fl / B / 1e9:.1f} GFLOP/img)")
t = timed(render, (p16, w, sh))
log(f"render bf16: {t * 1e3:.1f} ms/batch -> {B / t:.1f} img/s, "
    f"{fl / t / 1e12:.1f} TFLOP/s = {100 * fl / t / V5E_PEAK_BF16:.1f}% of bf16 peak")

# ---------------- train step (north-star: 1024 W-space, bs=12, bf16-G) ------
gen_t = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
G = GeneratorBundle(
    name="StyleGAN2", dim_z=512, resolution=1024, out_channels=3,
    params=params, apply_fn=gen_t.apply, get_w_fn=gen_t.get_w, shift_in_w_space=True,
    supports_s2d_out=True)
S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                support_vectors_dim=512, learn_gammas=True)
R = Reconstructor("ResNet", dim=200, channels=3)
# The production launcher flags: bf16 G + R, S2D pair handoff, no remat.
cfg = TrainStepConfig(batch_size=12, num_support_sets=200,
                      min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                      z_truncation=0.7, shift_in_w_space=True,
                      generator_dtype="bfloat16",
                      reconstructor_dtype="bfloat16",
                      pair_layout="s2d")
key = jax.random.key(0)
state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
step = make_train_step(G, S, R, cfg, donate=False)
log("train state ready; compiling step...")
fl_step = flops_of(lambda st, gp, k, i: step(st, gp, k, i), (state, G.params, key, 1))
t_step = timed(lambda st, gp, k, i: step(st, gp, k, i), (state, G.params, key, 1),
               reps=10, rounds=3)
log(f"train step: {t_step * 1e3:.0f} ms ({1 / t_step:.2f} steps/s), "
    f"{fl_step:.3e} flops -> {fl_step / t_step / 1e12:.1f} TFLOP/s = "
    f"{100 * fl_step / t_step / V5E_PEAK_BF16:.1f}% of bf16 peak")

# ---------------- component attribution -------------------------------------
bz = jax.random.normal(jax.random.key(2), (12, 512))
p_bf = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, G.params)
bzb = bz.astype(jnp.bfloat16)

g_fwd = jax.jit(lambda p, z: G.apply(p, z, out_layout="s2d"))
t_gfwd = timed(g_fwd, (p_bf, bzb), reps=10)
log(f"  G fwd (bs12 bf16, S2D out): {t_gfwd * 1e3:.0f} ms")

imgs = jnp.zeros((12, 512, 512, 12), jnp.bfloat16)
r_params = state["r_params"]
r_fwd = jax.jit(lambda rp, a, b: R.apply_pair_s2d(rp, a, b, train=True,
                                                  dtype=jnp.bfloat16)[0])
t_r = timed(r_fwd, (r_params, imgs, imgs), reps=10)
log(f"  R fwd (ResNet18, S2D pairs, bf16, train-mode BN): {t_r * 1e3:.0f} ms")

s_params = state["s_params"]
idx = jnp.zeros((12,), jnp.int32)
warp = jax.jit(lambda sp, z, i: S.direction(sp, z, i))
t_warp = timed(warp, (s_params, bz, idx), reps=30)
log(f"  warp direction (jnp take, bs12): {t_warp * 1e3:.1f} ms")

import optax  # noqa: E402


def loss_fwd(sp, rp, gp, z, i, m):
    zg = z.astype(jnp.bfloat16)
    img = G.apply(gp, zg, out_layout="s2d")
    lat = G.get_w(gp, zg).astype(jnp.float32)
    d = S.direction(sp, lat, i)
    img2 = G.apply(gp, zg, (m[:, None] * d).astype(jnp.bfloat16), out_layout="s2d")
    logits, mh, _ = R.apply_pair_s2d(rp, img, img2, train=True, dtype=jnp.bfloat16)
    return (jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, i))
            + 0.25 * jnp.mean(jnp.abs(mh - m)))


mags = jnp.full((12,), 0.15)
lf = jax.jit(loss_fwd)
t_fwd = timed(lf, (s_params, r_params, p_bf, bz, idx, mags), reps=10)
log(f"  full loss fwd (2x G + R + warp): {t_fwd * 1e3:.0f} ms")

lg = jax.jit(jax.grad(loss_fwd, argnums=(0, 1)))
t_fb = timed(lg, (s_params, r_params, p_bf, bz, idx, mags), reps=10)
log(f"  loss fwd+bwd: {t_fb * 1e3:.0f} ms -> backward ~{(t_fb - t_fwd) * 1e3:.0f} ms")
log(f"  optimizer/overhead: ~{(t_step - t_fb) * 1e3:.0f} ms (step - fwd+bwd)")
