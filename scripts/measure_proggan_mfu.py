#!/usr/bin/env python
"""ProgGAN render roofline: where does the forward's time go?

PERFORMANCE.md quotes 276 img/s (bf16, B=48, S2D tail) but never computed the
ProgGAN MFU. This script measures (a) XLA-cost-model FLOPs and achieved
TFLOP/s for the full forward, (b) a truncated-depth sweep so per-resolution
time attribution falls out of the deltas, at both tail layouts.
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))  # repo root

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.perf_counter()


def log(m):
    print(f"[pg-mfu +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps=20, rounds=3):
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
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


V5E_PEAK_BF16 = 197e12

from warpedganspace_tpu.models.api import cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.proggan import _BLOCK_SPECS, ProgGANGenerator  # noqa: E402

FULL = [512, 512, 512, 512, 512, 512, 512, 512, 512, 256, 256,
        128, 128, 64, 64, 32, 32, 16, 16]

B = 48
z = jax.random.normal(jax.random.key(1), (B, 512), jnp.bfloat16)

for layout in ("pallas", "s2d", "nhwc"):
    gen = ProgGANGenerator(tail_layout=layout)
    params = jax.jit(lambda k: gen.init(k))(jax.random.key(0))
    p16 = cast_params_bf16(params)
    fn = jax.jit(lambda p, z: gen.apply(p, z))
    fl, by = flops_of(lambda p, z: gen.apply(p, z), (p16, z))
    t = timed(fn, (p16, z))
    log(f"[{layout}] full: {t*1e3:7.1f} ms/batch{B} -> {B/t:7.1f} img/s, "
        f"{fl/B/1e9:6.1f} GFLOP/img, {fl/t/1e12:6.1f} TFLOP/s = "
        f"{100*fl/t/V5E_PEAK_BF16:4.1f}% MFU, bytes {by/B/1e6:7.1f} MB/img "
        f"-> {by/t/1e9:5.0f} GB/s")

# Depth sweep (s2d layout): cumulative time up to each block count.
prev_t, prev_fl = 0.0, 0.0
for nblocks in range(2, 19, 2):
    ch = FULL[: nblocks + 1]
    g = ProgGANGenerator(tail_layout="s2d")
    params = jax.jit(lambda k: g.init(k, channels=ch))(jax.random.key(0))
    p16 = cast_params_bf16(params)
    fn = jax.jit(lambda p, z: g.apply(p, z))
    fl, _ = flops_of(lambda p, z: g.apply(p, z), (p16, z))
    t = timed(fn, (p16, z), reps=10)
    res = 4 * (2 ** sum(1 for (_, _, up) in _BLOCK_SPECS[:nblocks] if up))
    log(f"depth {nblocks:2d} (res {res:4d}, ch {ch[-1]:3d}): {t*1e3:7.1f} ms  "
        f"delta {1e3*(t-prev_t):7.1f} ms  flops-delta {(fl-prev_fl)/B/1e9:6.1f} GFLOP/img")
    prev_t, prev_fl = t, fl
