#!/usr/bin/env python
"""Sustained-MXU bound for the SG2 mega-kernel body (VERDICT r4 item 5).

The one remaining StyleGAN2 render idea is ONE Pallas kernel for both tail
sections (MXU floor ~82 ms vs the 137 ms in-situ fold-x tail). Whether it can
win is a single question: what MXU utilization can the kernel's inner loop
sustain THROUGH the VPU window-builds (the grouped-im2col K-window
construction, ops/sg2_tail_pallas.py::_window)? The per-section kernels
sustain ~60%, at which a mega-kernel lands at 107-137 ms — wash for very high
complexity.

This rig measures that bound directly at the 1024-res section's same-conv
shape (wg=256 width-groups, K=256-lane windows, 3 taps, rb=8 row blocks),
isolating three variants of the exact inner-loop pattern:

  dots   — K-windows pre-resident in VMEM; only the tap matmuls + demod/leaky
           epilogue + output write run. The MXU ceiling of the loop.
  build  — only the window builds (m * s2 -> _window -> q). The VPU cost.
  full   — builds then dots, phase-separated as the production kernel runs
           (build all windows for the stripe, then consume each 3x).
  inter  — builds interleaved INTO the dot loop at row-block grain (window
           for block i+1 built between the taps of block i) — tests whether
           Mosaic overlaps data-independent VPU work with MXU work better
           under fine-grain interleaving than under phase separation.

sustain(v) = dot-FLOPs / t(v) / MEASURED_CEILING.

MEASURED RESULT (2026-08-20, v5e): dots 2.27 ms = 76.0% sustain, build
1.91 ms, full 2.34 ms = 73.9%, inter 2.35 ms — i.e. 97% of the build cost
is ALREADY hidden under the matmuls and the loop's ceiling is epilogue/
write-bound, not build-bound. That kills the mega-kernel's premise (there
is no serialized build time to reclaim): >500 img/s needs 76.4% sustain
from the FULL kernel (with noise/demod/RGB epilogues the rig omits), above
the 76.0% the stripped loop reaches. Closed as measured-and-rejected —
PERFORMANCE.md "Round-5 closure". Run from the repo root on the TPU.
"""
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from warpedganspace_tpu.ops.sg2_tail_pallas import _leaky, _window  # noqa: E402

T0 = time.perf_counter()
from bench import EXPECTED_PROBE_TFLOPS
MEASURED_CEILING = EXPECTED_PROBE_TFLOPS * 1e12  # single source: bench.py's slope-probe calibration (scripts/calibrate_mfu.py, round 5)

# 1024-res section same-conv pattern (C=32): wg width-groups of 128 lanes,
# K = 256-lane windows, 3 y-taps, _ROW_BLOCK=8.
WG = 256
K = 256
RB = 8
N_BLOCKS = 8          # 64 rows per grid step (one production stripe's pairs)
GRID = 96             # grid steps per call (~1 image-equivalent of stripes)
TAPS = 3

DOT_FLOPS_PER_CALL = GRID * N_BLOCKS * TAPS * 2 * (RB * WG) * K * 128


def log(m):
    print(f"[sg2-bound +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def _kernel(m_in, w, s2, d2, out, q, *, variant):
    s = s2[0, 0:1, :].astype(jnp.bfloat16)  # (1, 128) lane vector
    d = d2[0, 0:1, :].astype(jnp.float32)

    def build_block(i):
        r0 = i * RB
        # halo-free rig: window of the modulated m rows (the kernel's
        # q-buffer build, sg2_tail_pallas.py up_body; delta = C = 32)
        q[pl.ds(r0, RB)] = _window(m_in[0, pl.ds(r0, RB)] * s, 32, K)

    def dot_block(i):
        r0 = i * RB
        acc = jnp.zeros((RB, WG, 128), jnp.float32)
        for ky in range(TAPS):
            # production reads 3 row offsets of q; the rig folds the offset
            # into the same block (timing-equivalent VMEM reads)
            acc += lax.dot_general(q[pl.ds(r0, RB)], w[ky],
                                   (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out[0, pl.ds(r0, RB)] = _leaky((acc * d).astype(jnp.bfloat16))

    if variant in ("build", "full"):
        for i in range(N_BLOCKS):
            build_block(i)
    if variant == "build":
        # keep out written so the call isn't dead
        out[0, 0:RB] = q[0:RB, :, 0:128]
        return
    if variant == "inter":
        build_block(0)
        for i in range(N_BLOCKS):
            if i + 1 < N_BLOCKS:
                build_block(i + 1)
            dot_block(i)
        return
    for i in range(N_BLOCKS):
        dot_block(i)


def run(variant):
    rows = N_BLOCKS * RB
    m = jax.random.normal(jax.random.key(0), (GRID, rows, WG, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (TAPS, K, 128), jnp.bfloat16) * 0.05
    s2 = jnp.ones((1, 8, 128), jnp.float32)
    d2 = jnp.ones((1, 8, 128), jnp.float32)

    f = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, rows, WG, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, WG, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, rows, WG, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, WG, K), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )
    jf = jax.jit(lambda m: f(m, w, s2, d2))
    r = jf(m)
    float(jnp.sum(r[0, 0, 0].astype(jnp.float32)))  # materialize
    # Deep dispatch queue: the axon tunnel charges ~25 ms per sync window
    # (scripts/calibrate_mfu.py), so shallow rep counts inflate per-call time
    # by tunnel RTT / reps. 40 reps per window bounds that to <1 ms/call.
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(40):
            r = jf(m)
        float(jnp.sum(r[0, 0, 0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / 40)
    return best


def main():
    ts = {}
    for v in ("dots", "build", "full", "inter"):
        ts[v] = run(v)
        sustain = DOT_FLOPS_PER_CALL / ts[v] / MEASURED_CEILING
        note = "" if v != "build" else " (no dots — VPU+write cost only)"
        log(f"{v:6s}: {ts[v] * 1e3:7.2f} ms | dot-sustain "
            f"{100 * sustain:5.1f}% of ceiling{note}")
    serial = ts["dots"] + ts["build"]
    log(f"additivity: dots+build = {serial * 1e3:.2f} ms vs full "
        f"{ts['full'] * 1e3:.2f} (overlap {100 * (serial - ts['full']) / max(ts['build'], 1e-9):.0f}% "
        f"of the build hidden), inter {ts['inter'] * 1e3:.2f}")
    best = min(ts["full"], ts["inter"])
    log(f"BOUND: best achievable dot-sustain through window-builds = "
        f"{100 * DOT_FLOPS_PER_CALL / best / MEASURED_CEILING:.1f}% of the "
        f"179 TFLOP/s ceiling at the 1024-res section shape")


if __name__ == "__main__":
    main()
