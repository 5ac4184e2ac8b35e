#!/usr/bin/env python
"""StyleGAN2-1024 render time attribution per resolution block.

Sizes the remaining headline headroom: times the truncated synthesis at
increasing depth (headline config: B=96, bf16, tail_layout from argv or
'foldx') so per-block wall-clock falls out of the deltas, and compares each
tail block's time against its TRUE-FLOP roofline (the fold-x/s2d dense forms
carry 2-4x structural-zero FLOPs; a fused kernel would pay true FLOPs + one
HBM read/write).
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
    print(f"[sg2-sections +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


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


def flops_of(fn, args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


V5E_PEAK_BF16 = 197e12

from warpedganspace_tpu.models.api import cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import (  # noqa: E402
    StyleGAN2Generator, channels_dict)

B = int(sys.argv[2]) if len(sys.argv) > 2 else 96
layout = sys.argv[1] if len(sys.argv) > 1 else "foldx"
gen = StyleGAN2Generator(resolution=1024, tail_layout=layout)
params = jax.jit(lambda k: gen.init(k))(jax.random.key(0))
p16 = cast_params_bf16(params)
z = jax.random.normal(jax.random.key(1), (B, 512), jnp.bfloat16)
ch = channels_dict(gen.channel_multiplier)


def truncated(p, z, idx_hi):
    """Mapping + synthesis blocks [0, idx_hi); returns (out, skip) carry."""
    w = gen.style(p, z)
    latent = jnp.repeat(w[:, None, :], gen.n_latent, axis=1)
    noise = p["noises"]
    b = z.shape[0]
    from warpedganspace_tpu.models.stylegan2 import styled_conv, to_rgb
    out = jnp.tile(p["const_input"], (b, 1, 1, 1))
    out = styled_conv(p["conv1"], out, latent[:, 0], noise[0])
    skip = to_rgb(p["to_rgb1"], out, latent[:, 1])
    out, skip, _ = gen._synth_range(p, latent, noise, out, skip, 0, idx_hi, "NHWC")
    # Reduce at the boundary: returning the raw (out, skip) carry at 1024^2
    # keeps ~13 GB of buffers live past the block and OOMs; sums keep every
    # block computed (no DCE) without the liveness.
    return out.astype(jnp.float32).sum() + skip.astype(jnp.float32).sum()


n_blocks = len(range(3, gen.log_size + 1))
log(f"layout={layout} B={B} bf16; blocks cover res 8..{gen.resolution}")

prev_t, prev_fl = 0.0, 0.0
for idx_hi in range(0, n_blocks + 1):
    fn = jax.jit(lambda p, z, h=idx_hi: truncated(p, z, h))
    fl, by = flops_of(lambda p, z, h=idx_hi: truncated(p, z, h), (p16, z))
    t = timed(fn, (p16, z))
    res = 2 ** (idx_hi + 2) if idx_hi else 4
    c = ch[res] if res in ch else "-"
    dt, dfl = t - prev_t, fl - prev_fl
    # True FLOPs of the block just added (up 3x3 Cin->Co @ res + same 3x3 +
    # torgb 1x1), no fold penalty:
    if idx_hi:
        cin = ch[2 ** (idx_hi + 2 - 1)]
        co = ch[res]
        true_gf = (res * res * 9 * (cin * co + co * co) * 2 + res * res * co * 3 * 2) / 1e9
        roof_ms = true_gf * B / V5E_PEAK_BF16 * 1e6  # ms at 100% MFU
        log(f"depth {idx_hi:2d} (res {res:4d}, ch {co:3d}): cum {t*1e3:7.1f} ms | "
            f"block {dt*1e3:6.1f} ms, cost-model {dfl/B/1e9:6.1f} GF/img, "
            f"true {true_gf:6.1f} GF/img, true-roofline {roof_ms:5.1f} ms "
            f"({100*roof_ms/(dt*1e3+1e-9):5.1f}% eff)")
    else:
        log(f"depth  0 (res    4): cum {t*1e3:7.1f} ms (mapping+const+conv1+rgb)")
    prev_t, prev_fl = t, fl

fn = jax.jit(lambda p, z: gen.apply(p, z))
fl, by = flops_of(lambda p, z: gen.apply(p, z), (p16, z))
t = timed(fn, (p16, z))
log(f"FULL apply: {t*1e3:7.1f} ms/batch{B} -> {B/t:7.1f} img/s, "
    f"cost-model {fl/B/1e9:6.1f} GF/img, {fl/t/1e12:6.1f} TFLOP/s = "
    f"{100*fl/t/V5E_PEAK_BF16:4.1f}% MFU, bytes {by/B/1e6:7.1f} MB/img "
    f"-> {by/t/1e9:5.0f} GB/s")
