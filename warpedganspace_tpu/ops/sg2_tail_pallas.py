"""Pallas TPU kernel: fused StyleGAN2 thin-channel tail sections.

The StyleGAN2-1024 synthesis tail (reference ``models/StyleGAN2/model.py``
blocks at 512^2/1024^2, <=64 channels) dominates the render wall-clock: at the
headline config (B=96 bf16) the 1024-res block alone is 95 of a 205 ms forward
(scripts/measure_stylegan2_sections.py) while carrying only 58 true GFLOP/img —
the lane-dense XLA formulations (s2d / fold-x, models/stylegan2.py) pay a 2-4x
structural-zero FLOP factor because a C-channel contraction fills only C of the
MXU's 128 output lanes.

This kernel runs one whole resolution block — modulated up-conv (the
convT+blur composite) -> demod -> noise -> bias/leaky/sqrt2 -> modulated
same-conv -> demod -> noise -> bias/leaky/sqrt2 -> modulated ToRGB — as ONE
fused pass per (row-stripe, image) grid step. Three ideas:

1. **Grouped im2col matmuls**: outputs are produced fo = 128/C x-positions at
   a time (N = fo*C = 128 lanes, no padding). The K side is a *lane window* of
   the flattened W axis: the taps for output group g are the true pixels
   [fo*g - 1, fo*g + fo] — a contiguous 128/256/384-lane window starting at a
   fixed offset of group g. Per conv tap row ky this is ONE (M, K) @ (K, 128)
   matmul; the dense-FLOP factor drops to (fi+2)/fi/... — measured: up-conv
   1.33x true FLOPs (K = (fi+2)*2C exact), same-conv ceil((fo+2)*C/128)*128
   /(9C)x (2.67x at C=32 vs the fold-x form's 4x).
2. **flatshift patch building**: the K windows are built VMEM-resident from
   the fold-x activation with lane rolls + a cross-group select
   (``_flatshift``) — no halo copies through HBM, no relayout.
3. **Stripe-resident section**: the up output (modulated for the same conv)
   lives only in two phase-plane VMEM patch buffers; per section the HBM
   traffic is one read of the input + one write of the output (and the final
   section writes only the 3-channel RGB, not the C-channel activation).
   Noise+bias epilogue maps are pre-broadcast once per call in XLA and fetched
   once per *stripe* (the grid iterates images innermost), not per image.

Inference-only by design (StyleGAN2Generator routes tail_layout='pallas' on
the no-grad render path; a ``custom_vjp`` in the model falls back to the
fold-x composition for the backward).

Reference parity: the fused math is exactly the fold-x composition of
models/stylegan2.py (itself parity-tested >40 dB vs the reference CUDA model,
models/StyleGAN2/model.py:148-282) — suite-tested bit-level at HIGHEST matmul
precision in interpret mode, >40 dB on hardware (scripts/check_kernels_tpu.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warpedganspace_tpu.ops.rbf_pallas import _interpret

_LEAKY_SLOPE = 0.2
_GAIN = math.sqrt(2.0)
_ROW_BLOCK = 8
# (composite kernel row per output phase) — the convT(stride2)+blur polyphase
# row schedule; matches models/stylegan2.py::_PHASE_ROWS.
_PHASE_ROWS = ([1, 3, 5], [0, 2, 4])


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


# ---------------------------------------------------------------------------
# Weight-matrix builders (XLA side, once per call; selection tensors cached).
#
# Lane layouts: activations are fold-x (ops/s2d.py::fold_x): lane = hx*C + c.
# K-window slot j of output group g covers true x = f*g + j - 1 (f = the
# output-side fold of that conv's input).

@functools.lru_cache(maxsize=None)
def _up_sel(fi: int) -> np.ndarray:
    """sel[kx(6), j(fi+2), p(2*fi)]: x-tap selection of the up composite.

    Output slot p (true X = 2*fi*g + p, phase p%2) with x-tap ox reads input
    true u = X//2 + ox - 1 = fi*g + (p//2 + ox - 1) -> window slot
    j = p//2 + ox, composite column kx = _PHASE_ROWS[p%2][ox]."""
    fo = 2 * fi
    m = np.zeros((6, fi + 2, fo), np.float32)
    for p in range(fo):
        for ox in range(3):
            m[_PHASE_ROWS[p % 2][ox], p // 2 + ox, p] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _same_sel(fo: int) -> np.ndarray:
    """sel[ox(3), j(fo+2), p(fo)]: output slot p tap ox reads true
    x = fo*g + p + ox - 1 -> window slot j = p + ox."""
    m = np.zeros((3, fo + 2, fo), np.float32)
    for p in range(fo):
        for ox in range(3):
            m[ox, p + ox, p] = 1.0
    return m


def _compose_upsample_kernel(w: jax.Array) -> jax.Array:
    """convT(stride2, 3x3) + blur([1,3,3,1], gain 4) composite (6,6,Cin,Co).

    Same algebra as models/stylegan2.py::_compose_upsample_kernel (kept here so
    ops does not import models; both are pinned by the equivalence tests)."""
    kh, kw, cin, cout = w.shape
    k1 = jnp.asarray([1.0, 3.0, 3.0, 1.0], jnp.float32)
    blur = jnp.outer(k1, k1)
    blur = blur / jnp.sum(blur) * 4.0
    bl = blur.shape[0]
    io = cin * cout
    w_img = w.reshape(1, kh, kw, io)
    b_k = jnp.tile(jnp.flip(blur, (0, 1))[:, :, None, None],
                   (1, 1, 1, io)).astype(w.dtype)
    full = lax.conv_general_dilated(
        w_img, b_k, window_strides=(1, 1),
        padding=((bl - 1, bl - 1), (bl - 1, bl - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=io,
    )[0]
    return jnp.flip(full, (0, 1)).reshape(kh + bl - 1, kw + bl - 1, cin, cout)


def _up_mats(w_up: jax.Array, fi: int) -> jax.Array:
    """(3,3,2C,C) up weight -> (2 fy, 3 oy, (fi+2)*2C, 128) K-window mats.

    Output row Y (phase fy = Y%2) tap oy reads input row v = Y//2 + oy - 1
    with composite row _PHASE_ROWS[fy][oy]."""
    comp = _compose_upsample_kernel(w_up)              # (6, 6, 2C, C)
    cin, c = comp.shape[2], comp.shape[3]
    sel = jnp.asarray(_up_sel(fi), comp.dtype)
    full = jnp.einsum("XjP,YXio->YjiPo", sel, comp)    # (6, j, 2C, 2fi, C)
    full = full.reshape(6, (fi + 2) * cin, 2 * fi * c)
    kpad = _round_up(full.shape[1], 128)
    full = jnp.pad(full, ((0, 0), (0, kpad - full.shape[1]), (0, 0)))
    rows = np.array([_PHASE_ROWS[0], _PHASE_ROWS[1]])  # (2, 3)
    return full[jnp.asarray(rows.reshape(-1))].reshape(2, 3, kpad, 2 * fi * c)


def _same_mats(w_same: jax.Array, fo: int) -> jax.Array:
    """(3,3,C,C) same weight -> (3 ky, Kpad, 128), K = (fo+2)*C zero-padded
    to a lane multiple (the padded rows multiply garbage window lanes by 0)."""
    c = w_same.shape[2]
    sel = jnp.asarray(_same_sel(fo), w_same.dtype)
    full = jnp.einsum("XjP,YXio->YjiPo", sel, w_same)
    full = full.reshape(3, (fo + 2) * c, fo * c)
    kpad = _round_up((fo + 2) * c, 128)
    return jnp.pad(full, ((0, 0), (0, kpad - full.shape[1]), (0, 0)))


def _rgb_mat(w_rgb: jax.Array, fo: int, k: int) -> jax.Array:
    """(1,1,C,3) ToRGB weight -> block-diagonal (k*128, k*3*fo).

    A plain (128, 3*fo) ToRGB would write a 3*fo <= 24-lane output — the
    (8, 128) HBM tiling pads that ~10x and the block write alone measured
    21.6 ms/batch96. Instead ``k`` width-groups merge into the lane dim
    (in-kernel reshape (.., wg, 128) -> (.., wg/k, k*128), then this
    block-diagonal matmul): the output is k*3*fo <= 96 lanes, near-dense."""
    c = w_rgb.shape[2]
    eyek = jnp.eye(k, dtype=w_rgb.dtype)
    eyef = jnp.eye(fo, dtype=w_rgb.dtype)
    return jnp.einsum("uv,pq,io->upivqo", eyek, eyef, w_rgb[0, 0]).reshape(
        k * 128, k * 3 * fo)


def _nb_map(noise: jax.Array, nw: jax.Array, bias: jax.Array, c: int,
            dtype) -> jax.Array:
    """(1, R, R, 1) fixed noise buffer + scalar weight + (C,) bias -> the
    pre-broadcast fold-x epilogue map (R, R*C/128, 128): nw*noise + bias."""
    r = noise.shape[1]
    fo = 128 // c
    n = noise[0, :, :, 0].reshape(r, r // fo, fo) * nw
    nb = jnp.repeat(n, c, axis=-1) + jnp.tile(bias, fo)
    return nb.astype(dtype)


# ---------------------------------------------------------------------------
# Merged-layout skip blur-upsample (XLA side).
#
# The skip chain between fused sections must stay in the kernel's k-merged
# RGB layout: a fold-x (3*fo <= 24 lane) intermediate materializes the padded
# (8, 128) HBM tiling (~10x write amplification; measured +10-20 ms/batch96
# per level hop). These builders emit the blur-upsample ([1,3,3,1] FIR, up 2,
# reference ModulatedConv2d/ToRGB skip path) directly in merged fold fm.

def _blur_fb_offs():
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
    blur = np.outer(k1, k1)
    fb = np.flip(blur / blur.sum() * 4.0, (0, 1))
    # per output phase f: [(full-grid offset, tap index)] (ops/s2d._blur_taps)
    offs = {0: [(-1, 0), (0, 2)], 1: [(0, 1), (1, 3)]}
    return fb, offs


def _merged_blur_single_kernel(fp: int, fm: int, c: int, dtype):
    """fold-fp skip -> merged fold-fm on the doubled grid, ONE strided conv:
    kernel (4, fm//(2*fp) + 2, fp*c, fm*c), strides (1, fm//(2*fp)),
    lhs_dilation (2, 1), padding ((2,2),(1,1)). Requires (fm//2) % fp == 0."""
    fb, offs = _blur_fb_offs()
    sg = fm // (2 * fp)
    k = np.zeros((4, sg + 2, fp * c, fm * c), np.float32)
    eye = np.eye(c, dtype=np.float32)
    for fy in range(2):
        for (offy, ty) in offs[fy]:
            ky = 2 - fy + 2 * offy
            for px in range(fm):
                fx = px % 2
                for (offx, tx) in offs[fx]:
                    q = px // 2 + offx
                    jg, sl = q // fp + 1, q % fp
                    k[ky, jg, sl * c:(sl + 1) * c,
                      px * c:(px + 1) * c] += fb[ty, tx] * eye
    return jnp.asarray(k, dtype)


def _merged_blur_pair_kernels(fm: int, c: int, dtype):
    """fold-fm skip -> merged fold-fm on the doubled grid (stride would be
    half a group): TWO window-2 stride-1 convs (even / odd output groups),
    interleaved on the group axis by the caller."""
    fb, offs = _blur_fb_offs()
    ks = [np.zeros((4, 2, fm * c, fm * c), np.float32) for _ in range(2)]
    eye = np.eye(c, dtype=np.float32)
    for par, base in ((0, 0), (1, fm // 2)):
        for fy in range(2):
            for (offy, ty) in offs[fy]:
                ky = 2 - fy + 2 * offy
                for px in range(fm):
                    fx = px % 2
                    for (offx, tx) in offs[fx]:
                        q = base + px // 2 + offx   # even: [-1, fm//2];
                        # window groups: even [t-1, t], odd [t, t+1]
                        jg = q // fm + (1 - par)    # odd: [fm//2-1, fm]
                        sl = q % fm
                        ks[par][ky, jg, sl * c:(sl + 1) * c,
                                px * c:(px + 1) * c] += fb[ty, tx] * eye
    return jnp.asarray(ks[0], dtype), jnp.asarray(ks[1], dtype)


def merged_skip_blur_up(skip: jax.Array, fm: int) -> jax.Array:
    """Blur-upsample an RGB skip to the doubled grid in merged fold ``fm``.

    skip: (B, H, G, fp*3) fold-x/merged RGB (fp = lanes/3; fp=1 is plain
    NHWC). Returns (B, 2H, 2H*3... ) -> (B, 2H, W2/fm, fm*3)."""
    c = 3
    fp = skip.shape[-1] // c
    dn = ("NHWC", "HWIO", "NHWC")
    if fp == fm:
        ke, ko = _merged_blur_pair_kernels(fm, c, skip.dtype)
        even = lax.conv_general_dilated(
            skip, ke, window_strides=(1, 1), padding=((2, 2), (1, 0)),
            lhs_dilation=(2, 1), dimension_numbers=dn)
        odd = lax.conv_general_dilated(
            skip, ko, window_strides=(1, 1), padding=((2, 2), (0, 1)),
            lhs_dilation=(2, 1), dimension_numbers=dn)
        b, r2, n, lanes = even.shape
        return jnp.stack([even, odd], axis=3).reshape(b, r2, 2 * n, lanes)
    if (fm // 2) % fp != 0:
        raise ValueError(f"unsupported fold pair fp={fp} fm={fm}")
    k = _merged_blur_single_kernel(fp, fm, c, skip.dtype)
    return lax.conv_general_dilated(
        skip, k, window_strides=(1, fm // (2 * fp)), padding=((2, 2), (1, 1)),
        lhs_dilation=(2, 1), dimension_numbers=dn)


# ---------------------------------------------------------------------------
# In-kernel helpers (resident values).

def _shift_wg(z: jax.Array, q: int) -> jax.Array:
    """out[..., g, :] = z[..., g+q, :], zero fill (|q| <= 1)."""
    if q == 0:
        return z
    ax = z.ndim - 2
    zero = jnp.zeros_like(lax.slice_in_dim(z, 0, abs(q), axis=ax))
    if q > 0:
        return jnp.concatenate(
            [lax.slice_in_dim(z, q, None, axis=ax), zero], axis=ax)
    return jnp.concatenate(
        [zero, lax.slice_in_dim(z, 0, q, axis=ax)], axis=ax)


def _flatshift(x: jax.Array, t: int) -> jax.Array:
    """Shift along the flattened (wg*128) axis: out[.., g, l] =
    flat[g*128 + l + t], zero fill at both ends (x-direction conv padding)."""
    q, r = divmod(t, 128)
    a = _shift_wg(x, q)
    if r == 0:
        return a
    # Lanes [0, 128-r) come from a[.., r:], lanes [128-r, 128) from the next
    # group b[.., :r] — one static-slice concat (pltpu.roll is 32-bit-only on
    # this Mosaic; slice+concat lowers fine for bf16, probed on v5e).
    b = _shift_wg(x, q + 1)
    return jnp.concatenate([a[..., r:], b[..., :r]], axis=-1)


def _window(x: jax.Array, delta: int, lanes: int) -> jax.Array:
    """K-window build: concat of flatshift pieces t_k = 128*k - delta covering
    ``lanes`` total lanes (the last piece may carry garbage lanes — the W mats
    zero those K rows)."""
    pieces = [_flatshift(x, 128 * k - delta) for k in range(lanes // 128)]
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)


def _leaky(v: jax.Array) -> jax.Array:
    # max/min form: bf16 vector compares are unsupported on v5e Mosaic, and
    # this is 3 packed arithmetic ops instead of compare+select.
    zero = jnp.zeros((), v.dtype)
    return (jnp.maximum(v, zero)
            + jnp.asarray(_LEAKY_SLOPE, v.dtype) * jnp.minimum(v, zero)) * \
        jnp.asarray(_GAIN, v.dtype)


# ---------------------------------------------------------------------------
# Kernel

def _section_kernel(x_blk, xh, n1s, nb2, svec, wu, w2, w3, rgbb, *refs,
                    stripe, h_in, ns, wg, c, fi, fo, lup, lsame, k, want_x2):
    if want_x2:
        rgb_out, x2_out, xin, pbuf, q0, q1 = refs
    else:
        rgb_out, xin, pbuf, q0, q1 = refs
        x2_out = None
    s = pl.program_id(0)
    h2 = stripe // 2
    dt = xin.dtype
    cin = 2 * c

    # ---- input rows [s*h2 - 2, s*h2 + h2 + 2). Everything arrives through
    # auto-pipelined (double-buffered, copy-elided) blocks — manual sync DMAs
    # here measured 38 us/step, 30% of the kernel. The bulk h2 rows are the
    # x_blk block; the 2+2 zero-padded halo rows are the XLA-prepared xh
    # strips; n1s (the noise1 epilogue strip, rows [s*stripe-1, +stripe+2))
    # is an XLA-prepared overlapping-strip array whose block is re-fetched
    # only when the stripe index changes (images iterate innermost). ----
    xin[0:2] = xh[0, 0, 0:2]
    xin[pl.ds(2, h2)] = x_blk[0]
    xin[pl.ds(h2 + 2, 2)] = xh[0, 0, 2:4]

    # Epilogue math runs in the storage dtype (the fold-x XLA composition also
    # scales/adds noise/activates in bf16); only the matmul accumulators and
    # the demod scale of the fresh accumulator stay f32.
    sv = svec[0]                       # (8, 128): s1, d1, s2, d2, s3, -, -, -
    s1 = sv[0].reshape(1, 1, 128).astype(dt)
    d1 = sv[1].reshape(1, 1, 128).astype(jnp.float32)
    s2 = sv[2].reshape(1, 1, 128).astype(dt)
    d2 = sv[3].reshape(1, 1, 128).astype(jnp.float32)
    s3 = sv[4].reshape(1, 1, 128).astype(dt)

    # ---- up-conv K-window patches: P[v] = window(xin[v] * s1) ----
    rows_in = h2 + 4
    rb = min(_ROW_BLOCK, rows_in)

    def p_body(i, _):
        r0 = jnp.minimum(i * rb, rows_in - rb)
        pbuf[pl.ds(r0, rb)] = _window(xin[pl.ds(r0, rb)] * s1, cin, lup)
        return 0

    lax.fori_loop(0, pl.cdiv(rows_in, rb), p_body, 0, unroll=True)

    # ---- up rows -> modulated same-conv K-window patches, two phase planes:
    # q0[j] holds the window of m-row (s*stripe + 2j) (phase 0),
    # q1[j] of m-row (s*stripe + 2j - 1) (phase 1); m = leaky(acc*d1 + nb1).
    wu_m = wu[...]
    n_up = stripe // 2 + 1
    rbu = min(_ROW_BLOCK, n_up)

    def up_body(i, _):
        j0 = jnp.minimum(i * rbu, n_up - rbu)
        nblk = n1s[0, pl.ds(2 * j0, 2 * rbu)].reshape(rbu, 2, wg, 128)
        for plane, ref, dj in ((0, q0, 1), (1, q1, 0)):
            acc = jnp.zeros((rbu, wg, 128), jnp.float32)
            for oy in range(3):
                slab = pbuf[pl.ds(j0 + dj + oy, rbu)]
                acc += lax.dot_general(
                    slab, wu_m[plane, oy], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # plane0 row 2j pairs with n1s local row 2j+1; plane1 row 2j-1
            # with local 2j (n1s local 0 is row s*stripe - 1).
            m = _leaky((acc * d1).astype(dt) + nblk[:, 1 - plane])
            ref[pl.ds(j0, rbu)] = _window(m * s2, c, lsame)
        return 0

    lax.fori_loop(0, pl.cdiv(n_up, rbu), up_body, 0, unroll=True)

    # Zero the out-of-image m rows (same-conv y padding): row -1 = q1[0] of
    # stripe 0, row R = q0[n_up-1] of the last stripe.
    zq = jnp.zeros((1, wg, lsame), dt)
    if ns == 1:
        q1[0:1] = zq
        q0[pl.ds(n_up - 1, 1)] = zq
    else:
        @pl.when(s == 0)
        def _top():
            q1[0:1] = zq

        @pl.when(s == ns - 1)
        def _bottom():
            q0[pl.ds(n_up - 1, 1)] = zq

    # ---- same-conv + ToRGB, phase-interleaved output rows ----
    w2_m = w2[...]
    w3_m = w3[...]
    rgbb_m = rgbb[...].astype(jnp.float32)
    n_pairs = stripe // 2
    rbo = min(_ROW_BLOCK, n_pairs)

    def out_body(i, _):
        i0 = jnp.minimum(i * rbo, n_pairs - rbo)
        nblk = nb2[pl.ds(2 * i0, 2 * rbo)].reshape(rbo, 2, wg, 128)
        ys, rgbs = [], []
        for phase in (0, 1):
            if phase == 0:   # rows 2i: m rows 2i-1, 2i, 2i+1
                slabs = (q1.at[pl.ds(i0, rbo)], q0.at[pl.ds(i0, rbo)],
                         q1.at[pl.ds(i0 + 1, rbo)])
            else:            # rows 2i+1: m rows 2i, 2i+1, 2i+2
                slabs = (q0.at[pl.ds(i0, rbo)], q1.at[pl.ds(i0 + 1, rbo)],
                         q0.at[pl.ds(i0 + 1, rbo)])
            acc = jnp.zeros((rbo, wg, 128), jnp.float32)
            for ky in range(3):
                acc += lax.dot_general(
                    slabs[ky][...], w2_m[ky], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            x2 = _leaky((acc * d2).astype(dt) + nblk[:, phase])
            # ToRGB with k width-groups merged into lanes: the (wg, 128) ->
            # (wg/k, k*128) reshape is the canonical sublane->lane tile merge
            # (cheap), and the k*3*fo-lane output writes near-dense HBM tiles.
            x2m = (x2 * s3).reshape(rbo, wg // k, k * 128)
            rgb = lax.dot_general(
                x2m, w3_m, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + rgbb_m
            rgbs.append(rgb.astype(rgb_out.dtype))
            if want_x2:
                ys.append(x2)
        inter_rgb = jnp.stack(rgbs, axis=1).reshape(2 * rbo, wg // k, k * 3 * fo)
        rgb_out[0, pl.ds(2 * i0, 2 * rbo)] = inter_rgb
        if want_x2:
            inter = jnp.stack(ys, axis=1).reshape(2 * rbo, wg, 128)
            x2_out[0, pl.ds(2 * i0, 2 * rbo)] = inter
        return 0

    lax.fori_loop(0, pl.cdiv(n_pairs, rbo), out_body, 0, unroll=True)


# ---------------------------------------------------------------------------
# Section launcher

def rgb_merge_factor(c: int, wg: int) -> int:
    """Width-groups merged into the RGB output lanes: as many as keep
    k*3*fo <= 128 (=> 96 lanes), clamped to a power-of-two divisor of wg."""
    return min(32 // (128 // c), wg & -wg)


def fused_section(x, w_up, w_same, w_rgb, s1, d1, s2, d2, s3,
                  n1, nw1, b1, n2, nw2, b2, rgb_b,
                  want_x2: bool = True):
    """One fused StyleGAN2 tail section on fold-x input.

    Args:
        x: (B, H_in, WG, 128) fold-fi input at resolution R/2 (fi = 64/C;
           fi = 1 means plain NHWC with 2C = 128 channels).
        w_up/w_same/w_rgb: scale-folded conv weights (3,3,2C,C) / (3,3,C,C) /
           (1,1,C,3).
        s1/d1/s2/d2/s3: per-sample modulation / demodulation vectors
           (B, 2C) / (B, C) x4 (to_rgb has no demod).
        n1/n2: fixed (1, R, R, 1) noise buffers; nw1/nw2 their scalar
           weights; b1/b2 the (C,) activation biases; rgb_b (3,).
        want_x2: also write the (B, R, WG, 128) fold-2fi activation (the next
           section's input); the final section passes False and writes only
           the RGB contribution.

    Returns (rgb, x2) or rgb: rgb is (B, R, WG/k, k*3*fo) — the fold-x RGB
    with k = rgb_merge_factor(C, WG) width-groups merged into lanes (lane
    order (k-sub, fold-slot, rgb) is row-major in true x, so
    ``rgb.reshape(B, R, W, 3)`` is the logical image).
    """
    c = w_up.shape[3]
    if w_up.shape[:3] != (3, 3, 2 * c) or w_same.shape != (3, 3, c, c):
        raise ValueError("section weights must be up (3,3,2C,C) + same (3,3,C,C)")
    if w_rgb.shape != (1, 1, c, 3):
        raise ValueError(f"to_rgb weight must be (1,1,{c},3), got {w_rgb.shape}")
    if 64 % c != 0 or c > 64:
        raise ValueError(f"C={c} must divide 64")
    fi = 64 // c
    fo = 128 // c
    b, h_in, wg, lanes = x.shape
    if lanes != 128:
        raise ValueError(f"input must be x-folded to 128 lanes, got {lanes}")
    if wg % 8 != 0:
        raise ValueError(f"folded width {wg} must be a multiple of 8")
    if h_in % 2 != 0:
        raise ValueError(f"input rows {h_in} must be even")
    r = 2 * h_in
    if n1.shape != (1, r, r, 1) or n2.shape != (1, r, r, 1):
        raise ValueError(f"noise buffers must be (1,{r},{r},1)")
    if r * c != wg * 128:
        raise ValueError("input fold does not match fi = 64/C")

    import os as _os
    max_stripe = int(_os.environ.get("SG2_STRIPE", 128 if x.dtype == jnp.bfloat16 else 64))
    stripe = r if r <= max_stripe else max_stripe
    if r % stripe != 0:
        raise ValueError(f"output rows {r} not divisible by stripe {stripe}")
    ns = r // stripe
    if ns > 1 and h_in < stripe // 2 + 2:
        raise ValueError("stripe halo exceeds input rows")

    lup = _round_up((fi + 2) * 2 * c, 128)
    lsame = _round_up((fo + 2) * c, 128)
    k = rgb_merge_factor(c, wg)
    wu = _up_mats(w_up, fi).astype(x.dtype)
    w2 = _same_mats(w_same, fo).astype(x.dtype)
    w3 = _rgb_mat(w_rgb, fo, k).astype(x.dtype)
    nb1 = _nb_map(n1, nw1, b1, c, x.dtype)
    nb2 = _nb_map(n2, nw2, b2, c, x.dtype)
    h2 = stripe // 2
    # Zero-padded input halo rows per stripe: (B, ns, 4, wg, 128) with rows
    # [s*h2-2, s*h2) ++ [(s+1)*h2, +2); and the noise1 strip per stripe:
    # (ns, stripe+2, wg, 128) rows [s*stripe-1, +stripe+2). Prepared here so
    # the kernel has no manual DMA or edge branches at all.
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    xh = jnp.stack(
        [jnp.concatenate([xp[:, s * h2: s * h2 + 2],
                          xp[:, (s + 1) * h2 + 2: (s + 1) * h2 + 4]], axis=1)
         for s in range(ns)], axis=1)
    nbp = jnp.pad(nb1, ((1, 1), (0, 0), (0, 0)))
    nb1s = jnp.stack([nbp[s * stripe: s * stripe + stripe + 2]
                      for s in range(ns)], axis=0)
    svec = jnp.zeros((b, 8, 128), jnp.float32)
    svec = svec.at[:, 0].set(jnp.tile(s1, (1, fi)).astype(jnp.float32))
    svec = svec.at[:, 1].set(jnp.tile(d1, (1, fo)).astype(jnp.float32))
    svec = svec.at[:, 2].set(jnp.tile(s2, (1, fo)).astype(jnp.float32))
    svec = svec.at[:, 3].set(jnp.tile(d2, (1, fo)).astype(jnp.float32))
    svec = svec.at[:, 4].set(jnp.tile(s3, (1, fo)).astype(jnp.float32))
    rgbb = jnp.tile(rgb_b, k * fo).reshape(1, k * 3 * fo).astype(x.dtype)

    kernel = functools.partial(
        _section_kernel, stripe=stripe, h_in=h_in, ns=ns, wg=wg, c=c,
        fi=fi, fo=fo, lup=lup, lsame=lsame, k=k, want_x2=want_x2)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, r, wg // k, k * 3 * fo), x.dtype)]
    out_specs = [pl.BlockSpec((1, stripe, wg // k, k * 3 * fo),
                              lambda s, bb: (bb, s, 0, 0),
                              memory_space=pltpu.VMEM)]
    if want_x2:
        out_shape.append(jax.ShapeDtypeStruct((b, r, wg, 128), x.dtype))
        out_specs.append(pl.BlockSpec((1, stripe, wg, 128),
                                      lambda s, bb: (bb, s, 0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        grid=(ns, b),
        in_specs=[
            pl.BlockSpec((1, h2, wg, 128), lambda s, bb: (bb, s, 0, 0),
                         memory_space=pltpu.VMEM),   # x bulk (pipelined)
            pl.BlockSpec((1, 1, 4, wg, 128), lambda s, bb: (bb, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # x halo rows
            pl.BlockSpec((1, stripe + 2, wg, 128), lambda s, bb: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # nb1 strip (per stripe)
            pl.BlockSpec((stripe, wg, 128), lambda s, bb: (s, 0, 0),
                         memory_space=pltpu.VMEM),   # nb2
            pl.BlockSpec((1, 8, 128), lambda s, bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),   # svec
            const, const, const, const,              # wu, w2, w3, rgbb
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((stripe // 2 + 4, wg, 128), x.dtype),   # xin
            pltpu.VMEM((stripe // 2 + 4, wg, lup), x.dtype),   # pbuf
            pltpu.VMEM((stripe // 2 + 1, wg, lsame), x.dtype),  # q0
            pltpu.VMEM((stripe // 2 + 1, wg, lsame), x.dtype),  # q1
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=_interpret(),
    )(x, xh, nb1s, nb2, svec, wu, w2, w3, rgbb)
    # rgb stays in the k-merged layout (B, R, WG/k, k*3*fo) — reshaping back
    # to (B, R, WG, 3*fo) here would make XLA materialize the padded-tile
    # 12-lane layout this kernel exists to avoid (measured +5 ms/batch96).
    # The flatten order (group, k-sub, fold-slot, rgb) is row-major in true x,
    # so downstream unfolds are pure logical reshapes.
    return tuple(outs) if want_x2 else outs[0]
