"""Pallas TPU kernel: fused ProgGAN thin-channel tail sections.

The ProgGAN synthesis tail (reference ``models/ProgGAN/model.py:65-95``, the
<=64-channel blocks at 256^2..1024^2) carries trivial FLOPs but dominates the
render wall-clock: XLA runs its thin-channel convs 6-15x off the roofline
because 16-64 channel contractions pad the 128-wide MXU/VPU lanes, and every
PixelNorm / WScale / LeakyReLU pass round-trips the 32 MB/image activation
through HBM (measured per-op in scripts/measure_proggan_mfu.py: the 1024^2
section alone is 102.5 of a 172 ms forward at B=48).

This kernel runs one whole resolution section — PixelNorm -> nearest-up
conv3x3 -> WScale -> LeakyReLU -> PixelNorm -> conv3x3 -> WScale -> LeakyReLU
[-> PixelNorm -> conv1x1 -> WScale for the final RGB head] — as ONE fused
pass per (image, row-stripe) grid step. Two ideas make it lane-dense:

1. **Fold-x layout**: a C-channel tensor is stored as (B, H, W/f, f*C) with
   f = 128/C, so the minor dim is exactly the 128 lanes — no padding anywhere.
   Convs become (128, 128) matmuls over row slabs: the x-fold turns the 3x3
   kernel into per-(ky, u) lane-dense matrices (u in {-1,0,1} indexes the
   folded-group neighbor), built once per call by ``_up_mats``/``_same_mats``
   (the polyphase algebra of ops/s2d.py generalized to arbitrary x-folds).
2. **Shift-the-result**: the folded-group dim is a *row* dim of the matmul,
   so conv tap shifts commute with the channel matmul —
   ``sum_u shift_u(X) @ W[u] == sum_u shift_u(X @ W[u])`` — and the kernel
   never materializes shifted/halo copies of the input; it shifts the small
   f32 accumulator along the sublane dim instead.

Everything between the input DMA and the output write stays in VMEM:
PixelNorm is a block-diagonal (128, 128) matmul on resident data, WScale's
scale folds into the conv matrices, biases and LeakyReLU ride the f32
accumulator. Per section the HBM traffic collapses to one read of the input
plus one write of the output.

Inference-only by design: traversal/sampling never differentiate G, and the
training step keeps the autodiff-friendly s2d composition
(``ProgGANGenerator`` routes ``tail_layout='pallas'`` only on the no-grad
render path; a ``custom_vjp`` fallback re-runs the jnp twin for safety).
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
_PN_EPS = 1e-8
_ROW_BLOCK = 8      # output-row pairs / up rows per matmul step
_MAX_STRIPE = 256   # output rows per grid step (bounds VMEM)

# Nearest-up + conv3x3 phase taps (ops/s2d.py::_nearest_up_conv_taps):
# phase 0 reads input offset -1 with w-tap 0 and offset 0 with w-taps 1+2;
# phase 1 reads offset 0 with w-taps 0+1 and offset +1 with w-tap 2.
_UP_ROWS = {0: ((-1, (0,)), (0, (1, 2))), 1: ((0, (0, 1)), (1, (2,)))}


# ---------------------------------------------------------------------------
# Fold-layout helpers (XLA side; canonical definitions in ops/s2d.py)

from warpedganspace_tpu.ops.s2d import fold_x, unfold_x  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Weight-matrix builders: static 0/1 selection tensors (numpy) einsum'd with
# the conv weights per call. Lane layouts: input hx*Cin + ci, output px*Cout
# + co; u indexes the folded-group neighbor the tap lands in.

@functools.lru_cache(maxsize=None)
def _same_sel(c: int) -> np.ndarray:
    """M[u, ox, hx, px] for the same-grid 3x3 conv at fold f=128/c."""
    f = 128 // c
    m = np.zeros((3, 3, f, f), np.float32)
    for px in range(f):
        for ox in (-1, 0, 1):
            q = px + ox
            m[q // f + 1, ox + 1, q % f, px] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _up_sel(c: int) -> np.ndarray:
    """M[fy, a, u, oy, ox, hx, px] for nearest-up conv3x3: input fold
    fi = 64/c (2c channels), output fold fo = 128/c."""
    fo = 128 // c
    fi = fo // 2
    m = np.zeros((2, 2, 3, 3, 3, fi, fo), np.float32)
    for fy in range(2):
        for a, (offy, oys) in enumerate(_UP_ROWS[fy]):
            del offy  # row placement handled by slab choice in the kernel
            for px in range(fo):
                fx = px % 2
                for offx, oxs in _UP_ROWS[fx]:
                    h = px // 2 + offx
                    for oy in oys:
                        for ox in oxs:
                            m[fy, a, h // fi + 1, oy, ox, h % fi, px] += 1.0
    return m


def _same_mats(w: jax.Array, scale: jax.Array) -> jax.Array:
    """(3,3,C,C) conv weight (+WScale scale) -> (3 ky, 3 u, 128, 128)."""
    c = w.shape[2]
    sel = _same_sel(c)
    ws = (w * scale).astype(w.dtype)
    out = jnp.einsum("uxhp,yxcd->yuhcpd", jnp.asarray(sel, w.dtype), ws)
    return out.reshape(3, 3, 128, 128)


def _up_mats(w: jax.Array, scale: jax.Array) -> jax.Array:
    """(3,3,2C,C) up-conv weight (+scale) -> (2 fy, 2 a, 3 u, 128, 128)."""
    c = w.shape[3]
    sel = _up_sel(c)
    ws = (w * scale).astype(w.dtype)
    out = jnp.einsum("FAUyxhp,yxcd->FAUhcpd", jnp.asarray(sel, w.dtype), ws)
    return out.reshape(2, 2, 3, 128, 128)


def _head_mat(w: jax.Array, scale: jax.Array) -> jax.Array:
    """(1,1,C,3) out conv (+scale) -> block-diag (128, 3*fold)."""
    c = w.shape[2]
    f = 128 // c
    eye = jnp.asarray(np.eye(f, dtype=np.float32), w.dtype)
    return jnp.einsum("hp,cd->hcpd", eye, (w[0, 0] * scale).astype(w.dtype)
                      ).reshape(128, 3 * f)


@functools.lru_cache(maxsize=None)
def _pn_mat(groups: int) -> np.ndarray:
    """Block-diagonal (128, 128) channel-mean matrix: ``groups`` blocks of
    ones(128/groups)/(128/groups) — PixelNorm's mean(x^2) as one matmul."""
    g = 128 // groups
    return np.kron(np.eye(groups, dtype=np.float32),
                   np.full((g, g), 1.0 / g, np.float32))


def _tile_bias(b: jax.Array, fold: int) -> jax.Array:
    return jnp.tile(b, fold)[None, :]  # (1, 128) — lane px*C+c -> b[c]


# ---------------------------------------------------------------------------
# Kernel

def _shift_u(z: jax.Array, u: int) -> jax.Array:
    """out[.., g, :] = z[.., g+u, :] with zero fill (tap from group g+u)."""
    if u == 0:
        return z
    zero = jnp.zeros_like(z[:, :1])
    if u == 1:
        return jnp.concatenate([z[:, 1:], zero], axis=1)
    return jnp.concatenate([zero, z[:, :-1]], axis=1)


def _leaky(v: jax.Array) -> jax.Array:
    return jnp.where(v >= 0, v, _LEAKY_SLOPE * v)


def _pn_vmem(blk: jax.Array, p: jax.Array) -> jax.Array:
    """PixelNorm of a resident (rows, WG, 128) block via the block-diag mean
    matmul; rsqrt in f32, result in storage dtype."""
    m = lax.dot_general(blk * blk, p.astype(blk.dtype),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return (blk.astype(jnp.float32) * lax.rsqrt(m + _PN_EPS)).astype(blk.dtype)


def _section_kernel(x_hbm, p_in, p_mid, wu, bu, ws, bs, wh, bh, out_ref,
                    xin, up0, up1, sem, *, stripe, h_in, ns, wg, has_head):
    b = pl.program_id(0)
    s = pl.program_id(1)
    rows_in = stripe // 2 + 4
    dt = xin.dtype

    # ---- input DMA: rows [s*stripe/2 - 2, ... + rows_in) with zero halo ----
    def _copy(src_lo, dst_lo, n):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, n)], xin.at[pl.ds(dst_lo, n)], sem)
        cp.start()
        cp.wait()

    zrow = jnp.zeros((2, wg, 128), xin.dtype)
    if ns == 1:
        xin[0:2] = zrow
        xin[pl.ds(h_in + 2, 2)] = zrow
        _copy(0, 2, h_in)
    else:
        @pl.when(s == 0)
        def _first():
            xin[0:2] = zrow
            _copy(0, 2, rows_in - 2)

        @pl.when(s == ns - 1)
        def _last():
            xin[pl.ds(rows_in - 2, 2)] = zrow
            _copy(h_in - (rows_in - 2), 0, rows_in - 2)

        @pl.when(jnp.logical_and(s > 0, s < ns - 1))
        def _interior():
            _copy(s * (stripe // 2) - 2, 0, rows_in)

    # ---- PixelNorm the input slab in place (over the 2C channel groups).
    # In-place update => blocks must tile exactly (overlap would re-normalize
    # rows); rows_in is even, so an exact divisor block always exists. ----
    p_in_m = p_in[...]
    rb = next(d for d in range(min(2 * _ROW_BLOCK, rows_in), 0, -1)
              if rows_in % d == 0)

    def pn_body(i, _):
        r0 = i * rb
        xin[pl.ds(r0, rb)] = _pn_vmem(xin[pl.ds(r0, rb)], p_in_m)
        return 0

    lax.fori_loop(0, rows_in // rb, pn_body, 0)

    # ---- up-conv planes: plane p holds up rows Y = s*stripe + 2j - (1-p)*0
    # (plane0[j] = up row Y0+2j, plane1[j] = up row Y0-1+2j), both already
    # WScale'd, LeakyReLU'd AND PixelNorm'd (the same-conv block's input). ----
    p_mid_m = p_mid[...]
    n_up = stripe // 2 + 1
    rbu = min(_ROW_BLOCK, n_up)

    def up_body(i, _):
        j0 = jnp.minimum(i * rbu, n_up - rbu)
        for plane, ref in ((0, up0), (1, up1)):
            acc = jnp.zeros((rbu, wg, 128), jnp.float32)
            for a in (0, 1):
                slab = xin[pl.ds(j0 + 1 + a, rbu)]
                for u in (0, 1, 2):
                    z = lax.dot_general(
                        slab, wu[plane, a, u], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + _shift_u(z, u - 1)
            v = _leaky(acc + bu[...].astype(jnp.float32))
            ref[pl.ds(j0, rbu)] = _pn_vmem(v.astype(dt), p_mid_m)
        return 0

    lax.fori_loop(0, math.ceil(n_up / rbu), up_body, 0)

    # Zero-pad rows of the same-conv input at the image borders (conv pad=1
    # on the full grid): up row -1 lives at plane1[0] of stripe 0, up row R
    # at plane0[stripe/2] of the last stripe.
    zup = jnp.zeros((1, wg, 128), dt)
    if ns == 1:
        up1[0:1] = zup
        up0[pl.ds(stripe // 2, 1)] = zup
    else:
        @pl.when(s == 0)
        def _top():
            up1[0:1] = zup

        @pl.when(s == ns - 1)
        def _bottom():
            up0[pl.ds(stripe // 2, 1)] = zup

    # ---- same-conv (+ optional RGB head), phase-interleaved output ----
    n_pairs = stripe // 2
    rbo = min(_ROW_BLOCK, n_pairs)
    wh_m = wh[...] if has_head else None

    def out_body(i, _):
        i0 = jnp.minimum(i * rbo, n_pairs - rbo)
        ys = []
        for p in (0, 1):
            if p == 0:
                slabs = (up1.at[pl.ds(i0, rbo)], up0.at[pl.ds(i0, rbo)],
                         up1.at[pl.ds(i0 + 1, rbo)])
            else:
                slabs = (up0.at[pl.ds(i0, rbo)], up1.at[pl.ds(i0 + 1, rbo)],
                         up0.at[pl.ds(i0 + 1, rbo)])
            acc = jnp.zeros((rbo, wg, 128), jnp.float32)
            for ky in (0, 1, 2):
                slab = slabs[ky][...]
                for u in (0, 1, 2):
                    z = lax.dot_general(
                        slab, ws[ky, u], (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + _shift_u(z, u - 1)
            v = _leaky(acc + bs[...].astype(jnp.float32)).astype(dt)
            if has_head:
                v = _pn_vmem(v, p_mid_m)
                v = (lax.dot_general(v, wh_m, (((2,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                     + bh[...].astype(jnp.float32)).astype(out_ref.dtype)
            ys.append(v)
        inter = jnp.stack(ys, axis=1).reshape(2 * rbo, wg, ys[0].shape[-1])
        out_ref[0, pl.ds(2 * i0, 2 * rbo)] = inter
        return 0

    lax.fori_loop(0, math.ceil(n_pairs / rbo), out_body, 0)


# ---------------------------------------------------------------------------
# Section launcher

def fused_section(x, w_up, b_up, s_up, w_same, b_same, s_same,
                  head=None):
    """One fused tail section on fold-layout input.

    x: (B, H_in, WG, 128) — the 2C-channel input at resolution R/2, x-folded
    by fi = 64/C. Returns (B, 2*H_in, WG, 128) fold-layout activations (the
    next section's input), or (B, 2*H_in, WG, 3*fo) folded RGB when ``head``
    = (w_out, b_out, s_out) is given.
    """
    c = w_up.shape[3]
    if w_up.shape[:3] != (3, 3, 2 * c) or w_same.shape != (3, 3, c, c):
        raise ValueError("section weights must be up (3,3,2C,C) + same (3,3,C,C)")
    if 128 % c != 0 or c > 64:
        raise ValueError(f"C={c} must divide 128 and be <= 64")
    fo = 128 // c
    b, h_in, wg, lanes = x.shape
    if lanes != 128:
        raise ValueError(f"input must be x-folded to 128 lanes, got {lanes}")
    if wg % 8 != 0:
        raise ValueError(f"folded width {wg} must be a multiple of 8")
    if h_in % 2 != 0:
        raise ValueError(f"input rows {h_in} must be even")

    r = 2 * h_in
    stripe = r if r <= _MAX_STRIPE else _MAX_STRIPE
    if r % stripe != 0:
        raise ValueError(f"output rows {r} not divisible by stripe {stripe}")
    ns = r // stripe
    if ns > 1 and h_in < stripe // 2 + 2:
        raise ValueError("stripe halo exceeds input rows")

    wu = _up_mats(w_up, s_up)
    ws = _same_mats(w_same, s_same)
    bu = _tile_bias(b_up, fo)
    bs = _tile_bias(b_same, fo)
    p_in = jnp.asarray(_pn_mat(64 // c), x.dtype)   # fi groups of 2C lanes
    p_mid = jnp.asarray(_pn_mat(fo), x.dtype)       # fo groups of C lanes
    has_head = head is not None
    if has_head:
        w_out, b_out, s_out = head
        wh = _head_mat(w_out, s_out)
        bh = _tile_bias(b_out, fo)
        out_lanes = 3 * fo
    else:
        wh = jnp.zeros((128, 8), x.dtype)
        bh = jnp.zeros((1, 8), x.dtype)
        out_lanes = 128

    kernel = functools.partial(
        _section_kernel, stripe=stripe, h_in=h_in, ns=ns, wg=wg,
        has_head=has_head)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, ns),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  const, const, const, const, const, const, const, const],
        out_specs=pl.BlockSpec((1, stripe, wg, out_lanes),
                               lambda i, s: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, wg, out_lanes), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((stripe // 2 + 4, wg, 128), x.dtype),   # xin
            pltpu.VMEM((stripe // 2 + 1, wg, 128), x.dtype),   # up plane 0
            pltpu.VMEM((stripe // 2 + 1, wg, 128), x.dtype),   # up plane 1
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, p_in, p_mid, wu, bu, ws, bs, wh, bh)


# ---------------------------------------------------------------------------
# Whole-tail driver + autodiff safety net

def _tail_impl(x, section_params, out_params):
    """x: (B, H, W, 128) NHWC at the entry block (128 in-channels). Applies
    every (up, same) section then the RGB head; returns (B, R, W_full, 3)."""
    entry_c = section_params[0]["up"]["conv"]["w"].shape[3]
    x = fold_x(x, 128 // (2 * entry_c))
    for i, sp in enumerate(section_params):
        head = None
        if i == len(section_params) - 1:
            head = (out_params["conv"]["w"], out_params["wscale_bias"],
                    out_params["wscale_scale"])
        x = fused_section(
            x,
            sp["up"]["conv"]["w"], sp["up"]["wscale_bias"], sp["up"]["wscale_scale"],
            sp["same"]["conv"]["w"], sp["same"]["wscale_bias"], sp["same"]["wscale_scale"],
            head=head)
    last_c = section_params[-1]["same"]["conv"]["w"].shape[3]
    return unfold_x(x, 128 // last_c)


def _tail_jnp(x, section_params, out_params):
    """jnp twin (NHWC composition) — the backward-pass reference and the
    numerical oracle for tests. Mirrors models/proggan.py's NHWC block path."""
    from warpedganspace_tpu.nn import core as nn

    def block(p, x, up):
        x = nn.pixel_norm(x)
        if up:
            x = nn.upsample_nearest(x, 2)
        x = nn.conv2d(p["conv"], x, padding=1)
        x = x * p["wscale_scale"] + p["wscale_bias"]
        return jnp.where(x >= 0, x, _LEAKY_SLOPE * x)

    for sp in section_params:
        x = block(sp["up"], x, True)
        x = block(sp["same"], x, False)
    x = nn.pixel_norm(x)
    x = nn.conv2d(out_params["conv"], x, padding=0)
    return x * out_params["wscale_scale"] + out_params["wscale_bias"]


@jax.custom_vjp
def _tail_op(x, section_params, out_params):
    return _tail_impl(x, section_params, out_params)


def _tail_fwd(x, section_params, out_params):
    return _tail_impl(x, section_params, out_params), (x, section_params, out_params)


def _tail_bwd(res, ct):
    # Safety net only: the training path uses the s2d/nhwc composition.
    x, section_params, out_params = res
    _, vjp = jax.vjp(_tail_jnp, x, section_params, out_params)
    return vjp(ct)


_tail_op.defvjp(_tail_fwd, _tail_bwd)


def tail_sections_from_blocks(block_params, block_specs):
    """Split a ProgGAN block list into (head_blocks, section_params) at the
    fused-tail entry: the first up-block with cin <= 128 and cout = cin/2,
    after which the chain must alternate (up 2C->C, same C->C) with halving
    channels. Returns (n_head_blocks, sections) or (len(blocks), []) when no
    valid fused suffix exists."""
    n = len(block_params)
    entry = None
    for i, (p, (_, _, up)) in enumerate(zip(block_params, block_specs)):
        w = p["conv"]["w"]
        cin, cout = w.shape[2], w.shape[3]
        if up and cin <= 128 and cout * 2 == cin:
            entry = i
            break
    if entry is None or (n - entry) % 2 != 0:
        return n, []
    sections = []
    c = None
    for j in range(entry, n, 2):
        up_p, same_p = block_params[j], block_params[j + 1]
        _, _, up_flag = block_specs[j]
        _, _, same_flag = block_specs[j + 1]
        wu, wsm = up_p["conv"]["w"], same_p["conv"]["w"]
        cj = wu.shape[3]
        ok = (up_flag and not same_flag
              and wu.shape[:2] == (3, 3) and wsm.shape == (3, 3, cj, cj)
              and wu.shape[2] == 2 * cj and cj <= 64 and 128 % cj == 0
              and (c is None or cj * 2 == c))
        if not ok:
            return n, []
        sections.append({"up": up_p, "same": same_p})
        c = cj
    return entry, sections


def proggan_tail_pallas(x, section_params, out_params):
    """Fused tail on NHWC input at the entry block. Differentiable via a
    jnp-twin VJP (slow — training should use tail_layout='s2d')."""
    return _tail_op(x, section_params, out_params)
