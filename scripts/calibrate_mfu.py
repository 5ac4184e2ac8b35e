#!/usr/bin/env python
"""Reconcile the device probe vs the MFU table (VERDICT r4 weak item 1).

bench.py's probe sustains ~116 TFLOP/s on chained 8192^3 bf16 matmuls and the
MFU zoo reports the StyleGAN2 render at 153.3 TFLOP/s from XLA cost-model
FLOPs — a full conv model cannot out-execute a pure matmul chain, so one of
the two calibrations is wrong. Three experiments settle it:

A. Slope-method matmul probe: time chains of N in {8, 32, 128} matmuls in one
   program and fit t = a + b*N. The slope b is the pure per-matmul device
   time with every fixed cost (axon tunnel dispatch, D2H of the result
   scalar) removed — the number bench.py's fixed-chain probe approximates
   from outside the tunnel.

B. Hand-counted conv: a plain NHWC 3x3 conv at a production-like shape where
   true FLOPs = 2*B*H*W*kh*kw*Cin*Cout is unambiguous. Cross-check the XLA
   cost model against the hand count, and measure achieved TFLOP/s by slope.

C. lhs-dilated conv (the merged nearest-up kernel, ops/s2d.py): hand-dense
   vs hand-useful vs cost-model FLOP counts. If the cost model counts the
   structural zeros of dilation (which the MXU does NOT execute: XLA lowers
   lhs-dilated convs by skipping zero rows/cols per phase), every MFU row
   containing dilated/S2D convs is inflated.

Run from the repo root on the TPU: ``python scripts/calibrate_mfu.py``.
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


def log(m):
    print(f"[calibrate +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def best_time(f, *args, reps=5):
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_chain, arg, ns=(8, 32, 128)):
    """Fit t(N) = a + b*N over chain lengths; return (b, a)."""
    ts = []
    for n in ns:
        f = jax.jit(make_chain(n))
        ts.append(best_time(f, arg))
        log(f"  chain N={n:4d}: {ts[-1] * 1e3:9.3f} ms total, "
            f"{ts[-1] / n * 1e3:7.3f} ms/step amortized")
    # least squares on (n, t)
    import numpy as np

    A = np.stack([np.asarray(ns, float), np.ones(len(ns))], 1)
    b, a = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    return b, a


def exp_a_matmul():
    log("=== A. slope-method matmul probe (8192^3 bf16) ===")
    x = jnp.ones((8192, 8192), jnp.bfloat16)

    def make(n):
        def f(a):
            return jnp.sum(
                jax.lax.fori_loop(0, n, lambda i, c: (c @ x) * 1e-4, a))
        return f

    b, a = slope(make, x)
    fl = 2 * 8192**3
    log(f"slope: {b * 1e3:.3f} ms/matmul -> {fl / b / 1e12:.1f} TFLOP/s pure; "
        f"fixed overhead a = {a * 1e3:.2f} ms/dispatch")
    # Also the bare multiply with no scale epilogue, in case the f32 scale
    # round-trip costs anything.
    def make_bare(n):
        def f(a):
            return jnp.sum(
                jax.lax.fori_loop(0, n, lambda i, c: (c @ x).astype(jnp.bfloat16), a))
        return f

    b2, _ = slope(make_bare, x)
    log(f"bare slope: {b2 * 1e3:.3f} ms/matmul -> {fl / b2 / 1e12:.1f} TFLOP/s")
    return fl / b / 1e12, fl / b2 / 1e12


def cost_flops(f, *args):
    c = jax.jit(f).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def exp_b_conv():
    log("=== B. hand-counted plain conv (NHWC 3x3, B=96 64x64x512->512) ===")
    B, H, W, C = 96, 64, 64, 512
    x = jnp.ones((B, H, W, C), jnp.bfloat16)
    w = jnp.ones((3, 3, C, C), jnp.bfloat16) * 1e-3

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    hand = 2 * B * H * W * 3 * 3 * C * C
    cm = cost_flops(conv, x, w)
    log(f"hand FLOPs {hand / 1e9:.2f} G vs cost-model {cm / 1e9:.2f} G "
        f"(ratio {cm / hand:.3f})")

    def make(n):
        def f(x0):
            return jax.lax.fori_loop(
                0, n, lambda i, c: conv(c, w) * 1e-3, x0)
        return f

    b, a = slope(make, x, ns=(4, 16, 64))
    log(f"slope: {b * 1e3:.3f} ms/conv -> hand {hand / b / 1e12:.1f} TFLOP/s, "
        f"cost-model {cm / b / 1e12:.1f} TFLOP/s")
    return hand / b / 1e12


def exp_c_dilated():
    log("=== C. lhs-dilated conv (merged 2x-up 4x4 kernel, C=128) ===")
    # The fold-x/s2d tails and every merged nearest-up conv lower to
    # lhs_dilation=2 convs. Hand-dense counts every tap against the dilated
    # grid (incl. inserted zeros); hand-useful counts only nonzero taps: with
    # dilation 2, any 4 consecutive dilated positions contain exactly 2 even
    # (nonzero) ones, so EVERY output phase of a 4x4 kernel reads 2x2 nonzero
    # taps = 4 of 16 = dense/4. (A 3x3 kernel phases as 4+2+2+1 taps — also
    # 2.25/9 = 1/4 on average; the fraction is 1/4 either way.)
    B, H, W, C = 96, 32, 32, 128
    x = jnp.ones((B, H, W, C), jnp.bfloat16)
    w = jnp.ones((4, 4, C, C), jnp.bfloat16) * 1e-3

    def conv(x, w):
        # Exactly ops/s2d.py::nearest_up_conv_merged apply (lhs_dilation=2,
        # padding 2): output 2H x 2W.
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = jax.eval_shape(conv, x, w)
    Ho, Wo = out.shape[1], out.shape[2]
    hand_dense = 2 * B * Ho * Wo * 4 * 4 * C * C
    hand_useful = hand_dense / 4  # 2x2 nonzero taps per output phase (see above)
    cm = cost_flops(conv, x, w)
    log(f"out {Ho}x{Wo}; hand-dense {hand_dense / 1e9:.2f} G, hand-useful "
        f"{hand_useful / 1e9:.2f} G, cost-model {cm / 1e9:.2f} G "
        f"(cm/dense {cm / hand_dense:.3f}, cm/useful {cm / hand_useful:.3f})")

    def make(n):
        # The feedback must be NONLINEAR in the carry: conv is linear, so a
        # scalar-scale carry lets XLA hoist conv(x, w) out of the loop (first
        # attempt measured an impossible 530 "TFLOP/s" — the loop body had
        # been reduced to one elementwise scale). Max-pool the 2H x 2W output
        # back to the carry grid; its cost (~0.16 ms of HBM) is part of the
        # fixed-slope overhead we accept and note.
        def f(x0):
            def body(i, c):
                y = conv(c, w)
                p = jax.lax.reduce_window(
                    y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                return (p * 1e-3 + x).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x0)
        return f

    b, _ = slope(make, x, ns=(4, 16, 64))
    log(f"slope: {b * 1e3:.3f} ms/conv -> dense {hand_dense / b / 1e12:.1f}, "
        f"useful {hand_useful / b / 1e12:.1f}, cost-model {cm / b / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    pure, bare = exp_a_matmul()
    conv_tf = exp_b_conv()
    exp_c_dilated()
    log(f"SUMMARY: pure-matmul {pure:.1f} / bare {bare:.1f} TFLOP/s; "
        f"plain-conv (hand FLOPs) {conv_tf:.1f} TFLOP/s")
