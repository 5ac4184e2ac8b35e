#!/usr/bin/env python
"""BigGAN-128 render attribution (VERDICT r4 weak item 7).

The MFU table closes BigGAN render at ~48% MFU with "no measured lever
remains" — asserted after round 3 reclaimed the attention and up-conv shares,
but never backed by an attribution like ProgGAN's per-op table. This script
produces that table: a truncated-depth sweep over the generator (head ->
block-by-block -> output stage) at the production render config (B=64 bf16),
so each stage's time falls out of the deltas; the attention block and the
output stage (BN -> relu -> conv3x3 96->3 -> tanh) are also timed in
isolation, with XLA cost-model FLOPs per stage.

Run from the repo root on the TPU: ``python scripts/measure_biggan_render.py``.
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
V5E_PEAK_BF16 = 197e12
from bench import EXPECTED_PROBE_TFLOPS
MEASURED_CEILING = EXPECTED_PROBE_TFLOPS * 1e12  # single source: bench.py's slope-probe calibration (scripts/calibrate_mfu.py, round 5)
HBM_GBS = 819e9
B = 64


def log(m):
    print(f"[bg-render +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps=100, rounds=3):
    # 100-deep dispatch windows: the axon tunnel charges ~25 ms per sync
    # window (scripts/calibrate_mfu.py), which would inflate a 2 ms stage by
    # ~40% at 30 reps; at 100 reps the bias is <0.3 ms. The cumulative-depth
    # DELTAS are bias-free either way (one sync per window cancels).
    jfn = jax.jit(fn)
    sync(jfn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = jfn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def cost(fn, args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


from warpedganspace_tpu.models.api import cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.biggan import (  # noqa: E402
    BigGANGenerator, _attention, _gblock)
from warpedganspace_tpu.nn import core as nn  # noqa: E402


def truncated_apply(gen, params, z, n_blocks, with_attn=True, with_out=True):
    """gen.apply cut after n_blocks gblocks (attention included with its
    block when with_attn)."""
    y = gen.mixed_classes(z, None)
    y_embed = jnp.take(params["shared_embed"], y, axis=0)
    chunks = [z[:, i * gen.z_chunk_size:(i + 1) * gen.z_chunk_size]
              for i in range(gen.num_slots)]
    z0, zs = chunks[0], chunks[1:]
    conds = [jnp.concatenate([y_embed, zc], axis=1) for zc in zs]
    h = nn.linear(params["linear"], z0)
    c0 = gen.arch["in_channels"][0]
    h = h.reshape(z.shape[0], c0, gen.bottom_width, gen.bottom_width)
    h = h.transpose(0, 2, 3, 1)
    for i, block in enumerate(params["blocks"][:n_blocks]):
        h = _gblock(block, h, conds[i])
        if "attention" in block and with_attn:
            h = _attention(block["attention"], h)
    if not with_out or n_blocks < len(params["blocks"]):
        return h
    h = nn.batch_norm(params["out_bn"], h, train=False)
    h = jax.nn.relu(h)
    h = nn.conv2d(params["out_conv"], h, padding=1)
    return jnp.tanh(h)


def main():
    gen = BigGANGenerator.from_config(target_classes=(239,))
    params = cast_params_bf16(jax.jit(gen.init)(jax.random.key(0)))
    z = jax.random.normal(jax.random.key(3), (B, gen.dim_z), jnp.bfloat16)
    nb = len(gen.arch["in_channels"])
    res = [gen.bottom_width * 2 ** (i + 1) for i in range(nb)]
    chans = list(zip(gen.arch["in_channels"], gen.arch["out_channels"]))

    full_t = timed(lambda p, z: gen.apply(p, z), (params, z))
    fl, by = cost(lambda p, z: gen.apply(p, z), (params, z))
    log(f"FULL render B={B}: {full_t * 1e3:.2f} ms = {B / full_t:.0f} img/s | "
        f"{fl / full_t / 1e12:.1f} TFLOP/s = {100 * fl / full_t / V5E_PEAK_BF16:.1f}% MFU "
        f"({100 * fl / full_t / MEASURED_CEILING:.1f}% of ceiling) | "
        f"HBM {100 * by / full_t / HBM_GBS:.1f}%")

    # Truncated-depth sweep: t(k) for k = 0..nb blocks (no out stage), then
    # the full graph. Stage k's share = t(k) - t(k-1).
    ts = []
    fls = []
    bys = []
    for k in range(nb + 1):
        f = lambda p, z, k=k: truncated_apply(gen, p, z, k, with_out=False)
        ts.append(timed(f, (params, z)))
        cf, cb = cost(f, (params, z))
        fls.append(cf)
        bys.append(cb)
        tag = "head(linear+reshape)" if k == 0 else \
            f"block{k} {chans[k-1][0]}->{chans[k-1][1]}ch @{res[k-1]}^2" + \
            (" +SA-attn" if res[k - 1] == 64 else "")
        log(f"  cum k={k}: {ts[k] * 1e3:7.2f} ms   [{tag}]")
    out_t = full_t - ts[-1]
    log("--- per-stage deltas (ms | TFLOP/s | %ceiling | HBM%) ---")
    prev_t, prev_f, prev_b = 0.0, 0.0, 0.0
    for k in range(nb + 1):
        dt, df, db = ts[k] - prev_t, fls[k] - prev_f, bys[k] - prev_b
        prev_t, prev_f, prev_b = ts[k], fls[k], bys[k]
        tag = "head" if k == 0 else f"block{k} @{res[k-1]}^2"
        log(f"  {tag:18s}: {dt * 1e3:7.2f} ms | {df / max(dt, 1e-9) / 1e12:6.1f} "
            f"TFLOP/s | {100 * df / max(dt, 1e-9) / MEASURED_CEILING:5.1f}% | "
            f"HBM {100 * db / max(dt, 1e-9) / HBM_GBS:5.1f}%")
    log(f"  {'out stage':18s}: {out_t * 1e3:7.2f} ms | "
        f"{(fl - fls[-1]) / max(out_t, 1e-9) / 1e12:6.1f} TFLOP/s | "
        f"{100 * (fl - fls[-1]) / max(out_t, 1e-9) / MEASURED_CEILING:5.1f}% | "
        f"HBM {100 * (by - bys[-1]) / max(out_t, 1e-9) / HBM_GBS:5.1f}%")

    # Attention isolated at its block's input shape (64^2, C=2ch).
    cattn = gen.arch["out_channels"][-2]
    for i, block in enumerate(params["blocks"]):
        if "attention" in block:
            xa = jax.random.normal(jax.random.key(5),
                                   (B, 64, 64, cattn), jnp.bfloat16)
            ta = timed(lambda p, x: _attention(p, x),
                       (block["attention"], xa))
            fa, _ = cost(lambda p, x: _attention(p, x), (block["attention"], xa))
            log(f"SA-attention isolated (64^2, C={cattn}): {ta * 1e3:.2f} ms | "
                f">={fa / ta / 1e12:.1f} TFLOP/s (cost model blind to pallas)")

    # Out stage isolated (BN -> relu -> conv 3x3 ch->3 -> tanh at 128^2).
    cout = gen.arch["out_channels"][-1]
    xo = jax.random.normal(jax.random.key(6), (B, 128, 128, cout), jnp.bfloat16)

    def out_stage(p, x):
        h = nn.batch_norm(p["out_bn"], x, train=False)
        h = jax.nn.relu(h)
        h = nn.conv2d(p["out_conv"], h, padding=1)
        return jnp.tanh(h)

    to = timed(out_stage, (params, xo))
    fo, bo = cost(out_stage, (params, xo))
    log(f"out stage isolated (128^2, {cout}->3): {to * 1e3:.2f} ms | "
        f"{fo / to / 1e12:.1f} TFLOP/s | HBM {100 * bo / to / HBM_GBS:.1f}% "
        f"(conv to 3 channels pads 128-wide lanes 42x -> HBM/VPU-bound by design)")


if __name__ == "__main__":
    main()
