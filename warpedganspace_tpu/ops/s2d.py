"""Space-to-depth (S2D) convolution re-derivations.

TPU convolutions place features on the 128-wide lane dimension, so layers with
<128 channels pad 2-8x in HBM and bandwidth. In the S2D representation a
resolution-r, C-channel activation is stored as (B, r/2, r/2, 4C) — full
lanes — with channel layout idx = (phase_y*2 + phase_x)*C + c, i.e.
s2d(x)[i, j, (py, px, c)] = x[2i+py, 2j+px, c].

This module holds the generic, exactly-derived kernel builders (polyphase
algebra). Model-specific composites (e.g. StyleGAN2's conv_transpose+blur) live
with their models; ProgGAN's nearest-up+conv lives here as the canonical
"upsample" example.

Derivation sketch (1D, generalizes by outer product):
- same-grid 3x3 conv: output full-grid pixel p = 2i+dy reads taps p+o; with
  p+o = 2(i+U)+e this is a 3-block kernel entry at (U+1, phase e -> phase dy).
- upsample ops mapping grid g -> grid 2g: per output phase f the op is a
  small set of full-grid taps x[m+off]; with m+off = 2u+e the tap lands at
  dilated-kernel position k = off - e + pad, applied with lhs_dilation=2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def fold_x(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/f, f*C): fold f consecutive x-pixels into
    lanes (lane layout hx*C + c; a pure reshape). The 1D analog of ``to_s2d``:
    at the same 128-lane fill it halves the dense-FLOP factor of same-grid
    convs (f x vs the 2D form's 4x for C=64). f=1 is a no-op."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def unfold_x(x: jax.Array, f: int) -> jax.Array:
    """(B, H, W/f, f*C) -> (B, H, W, C)."""
    if f == 1:
        return x
    b, h, wg, fc = x.shape
    return x.reshape(b, h, wg * f, fc // f)


def fold_x_same_conv_kernel(w: jax.Array, f: int) -> jax.Array:
    """(3,3,C,Co) same-grid conv weight -> (3,3,f*C,f*Co) fold-x kernel
    (stride 1, padding 1 on the folded grid)."""
    _, _, c, co = w.shape
    k = jnp.zeros((3, 3, f * c, f * co), dtype=w.dtype)
    for px in range(f):
        for ox in (-1, 0, 1):
            q = px + ox
            k = k.at[:, q // f + 1, (q % f) * c:(q % f + 1) * c,
                     px * co:(px + 1) * co].set(w[:, ox + 1])
    return k


def fold_x_diag_1x1_kernel(w: jax.Array, f: int) -> jax.Array:
    """(1,1,C,Co) 1x1 conv weight -> block-diagonal (1,1,f*C,f*Co)."""
    _, _, c, co = w.shape
    k = jnp.zeros((1, 1, f * c, f * co), dtype=w.dtype)
    for px in range(f):
        k = k.at[0, 0, px * c:(px + 1) * c, px * co:(px + 1) * co].set(w[0, 0])
    return k


def to_s2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def from_s2d(x: jax.Array) -> jax.Array:
    """(B, h, w, 4C) -> (B, 2h, 2w, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def same_conv_kernel(w: jax.Array) -> jax.Array:
    """(3,3,C,Co) same-resolution conv weight -> (3,3,4C,4Co) S2D kernel
    (apply with stride 1, padding 1 on the half grid)."""
    _, _, c, co = w.shape
    k = jnp.zeros((3, 3, 4 * c, 4 * co), dtype=w.dtype)
    for dy in range(2):
        for dx in range(2):
            for oy in (-1, 0, 1):
                for ox in (-1, 0, 1):
                    ey, ex = (dy + oy) % 2, (dx + ox) % 2
                    uy, ux = (dy + oy - ey) // 2, (dx + ox - ex) // 2
                    k = k.at[
                        uy + 1, ux + 1,
                        (ey * 2 + ex) * c : (ey * 2 + ex) * c + c,
                        (dy * 2 + dx) * co : (dy * 2 + dx) * co + co,
                    ].set(w[oy + 1, ox + 1])
    return k


def diag_1x1_kernel(w: jax.Array) -> jax.Array:
    """(1,1,C,Co) 1x1 conv weight -> block-diagonal (1,1,4C,4Co) S2D kernel."""
    _, _, c, co = w.shape
    k = jnp.zeros((1, 1, 4 * c, 4 * co), dtype=w.dtype)
    for p in range(4):
        k = k.at[0, 0, p * c : (p + 1) * c, p * co : (p + 1) * co].set(w[0, 0])
    return k


def _nearest_up_conv_taps(w: jax.Array):
    """Phase taps of [2x nearest upsample -> conv3x3(pad 1)].

    y[p] = sum_o w[o+1] up(x)[p+o] with up(x)[n] = x[n//2]:
    phase 0 taps x[m-1] (w[0]) and x[m] (w[1]+w[2]);
    phase 1 taps x[m] (w[0]+w[1]) and x[m+1] (w[2]).
    Returns taps[(fy, fx)] = [((offy, offx), W (C,Co))].
    """
    rows = {0: {-1: [0], 0: [1, 2]}, 1: {0: [0, 1], 1: [2]}}
    taps = {}
    for fy in range(2):
        for fx in range(2):
            entries = []
            for offy, oys in rows[fy].items():
                for offx, oxs in rows[fx].items():
                    weight = sum(w[oy, ox] for oy in oys for ox in oxs)
                    entries.append(((offy, offx), weight))
            taps[(fy, fx)] = entries
    return taps


def up_entry_kernel_from_taps(taps, cin: int, cout: int, dtype) -> jax.Array:
    """Upsample op with NHWC input (grid g) and S2D output (same grid g):
    plain stride-1 conv kernel (3,3,Cin,4Co), padding 1."""
    k = jnp.zeros((3, 3, cin, 4 * cout), dtype=dtype)
    for (fy, fx), entries in taps.items():
        f_idx = (fy * 2 + fx) * cout
        for (offy, offx), weight in entries:
            k = k.at[offy + 1, offx + 1, :, f_idx : f_idx + cout].set(weight)
    return k


def up_s2d_kernel_from_taps(taps, cin: int, cout: int, dtype) -> jax.Array:
    """Upsample op with S2D input (grid g) and S2D output (grid 2g):
    (4,4,4Cin,4Co) kernel, apply with lhs_dilation 2, padding 2.

    Each full-grid tap x[m+off] is x_s2d[(m+off-e)/2, e]; it lands at dilated
    kernel position k = off + 2 - e for both parities e (the dilation zeros
    select the live one per output position)."""
    k = jnp.zeros((4, 4, 4 * cin, 4 * cout), dtype=dtype)
    for (fy, fx), entries in taps.items():
        f_idx = (fy * 2 + fx) * cout
        for (offy, offx), weight in entries:
            for ey in range(2):
                for ex in range(2):
                    e_idx = (ey * 2 + ex) * cin
                    k = k.at[
                        offy + 2 - ey, offx + 2 - ex,
                        e_idx : e_idx + cin, f_idx : f_idx + cout,
                    ].set(weight)
    return k


@functools.lru_cache(maxsize=1)
def _nearest_up_merged_sel():
    import numpy as np

    s = np.zeros((4, 4, 3, 3), np.float32)
    for dy in range(-2, 2):
        for dx in range(-2, 2):
            for oy in (-1, 0, 1):
                for ox in (-1, 0, 1):
                    if (oy - dy) in (0, 1) and (ox - dx) in (0, 1):
                        s[dy + 2, dx + 2, oy + 1, ox + 1] = 1.0
    return s


def nearest_up_conv_merged_kernel(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) conv weight -> (4,4,Ci,Co): [2x nearest-up -> conv3x3
    (pad 1)] as ONE plain-NHWC lhs-dilated conv (lhs_dilation=2,
    padding=((2,2),(2,2))). Same-output exact; 2.25x fewer dense MACs than
    conv-at-the-upsampled-resolution and no 4x intermediate (measured
    1.07-1.71x per BigGAN up-conv on v5e). k[d] = sum_{o-t=d, t in {0,1}} w[o]
    — nearest-up is zero-insertion convolved with ones(2,2)."""
    sel = jnp.asarray(_nearest_up_merged_sel(), w.dtype)
    return jnp.einsum("DEyx,yxcd->DEcd", sel, w)


def nearest_up_conv_merged_apply(x: jax.Array, k4: jax.Array) -> jax.Array:
    """Apply a merged nearest-up conv kernel: (B,H,W,Ci) -> (B,2H,2W,Co)."""
    return lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def nearest_up_conv_entry_kernel(w: jax.Array) -> jax.Array:
    """ProgGAN NormUpscaleConvBlock, NHWC -> S2D."""
    return up_entry_kernel_from_taps(
        _nearest_up_conv_taps(w), w.shape[2], w.shape[3], w.dtype
    )


def nearest_up_conv_s2d_kernel(w: jax.Array) -> jax.Array:
    """ProgGAN NormUpscaleConvBlock, S2D -> S2D."""
    return up_s2d_kernel_from_taps(
        _nearest_up_conv_taps(w), w.shape[2], w.shape[3], w.dtype
    )


def stem_conv_s2d_pair_kernel(w: jax.Array, num_images: int = 2) -> jax.Array:
    """7x7 stride-2 pad-3 stem conv (ResNet conv1) re-derived for an input
    that is a channel-concat of ``num_images`` S2D tensors.

    Full-grid: out[p] = sum_o w[o] x[2p + o - 3]; with x stored S2D
    (x2[u, e] = x[2u + e]) each tap lands at o - 3 = 2U + e, U in [-2, 1] —
    a 4x4 stride-1 conv on the half grid with padding ((2, 1), (2, 1)).

    Input channel layout: [image i][phase e][true channel c] (i.e. the concat
    of per-image ``to_s2d`` outputs), c_i = w.shape[2] // num_images channels
    per image. Exact; contraction depth 16*4*c_i*num_images is lane-dense,
    vs the 7x7 form whose c=2*c_i contraction XLA pads to the 128 lanes
    (measured ~2x on the conv at c_i=3, 1024^2, bs12, bf16).
    """
    kh, kw_, cf, co = w.shape
    assert (kh, kw_) == (7, 7), "derived for the 7x7 stride-2 ResNet stem"
    assert cf % num_images == 0
    ci = cf // num_images
    k = jnp.zeros((4, 4, 4 * cf, co), dtype=w.dtype)
    for oy in range(7):
        for ox in range(7):
            ey, ex = (oy - 3) % 2, (ox - 3) % 2
            uy, ux = (oy - 3 - ey) // 2, (ox - 3 - ex) // 2
            e = ey * 2 + ex
            for i in range(num_images):
                off = i * 4 * ci + e * ci
                k = k.at[uy + 2, ux + 2, off : off + ci, :].add(
                    w[oy, ox, i * ci : (i + 1) * ci]
                )
    return k


def s2d_conv(x: jax.Array, k: jax.Array, dilated: bool) -> jax.Array:
    """Apply an S2D kernel: same-grid stride-1 conv, or lhs-dilated
    grid-doubling conv. Padding preserves the grid size for both odd kernels
    (symmetric k//2) and the even kernels the stride-2 re-derivations produce
    (asymmetric (k//2, (k-1)//2) — e.g. the 4x4 stem kernel pads (2, 1)).

    1x1 kernels lower to a plain channel dot_general: XLA's conv path is
    lane-starved at thin S2D outputs (measured 17.6 -> 5.4 ms on the ProgGAN
    RGB head at (48, 512, 512, 64), and it feeds every StyleGAN2 S2D ToRGB);
    the products and their MXU operand rounding are identical either way."""
    if dilated:
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kh, kw = k.shape[0], k.shape[1]
    if (kh, kw) == (1, 1):
        return lax.dot_general(x, k[0, 0], (((3,), (0,)), ((), ())))
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _pn_mean_mat(c4: int):
    """Block-diagonal (4C, 4C) per-phase channel-mean matrix. Cached as
    numpy (a cached jax constant created under one trace would leak into
    others, e.g. across remat scopes)."""
    import numpy as np

    c = c4 // 4
    return np.kron(np.eye(4, dtype=np.float32),
                   np.full((c, c), 1.0 / c, np.float32))


def pixel_norm_s2d(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """PixelNorm over true channels — per phase group in the S2D layout.

    mean(x^2) runs as one block-diagonal channel matmul instead of the
    reshape/reduce form: the (.., 4, C) reshape forces a lane-granularity
    relayout that costs 3.5x a raw copy on TPU (measured 24.3 -> 8.9 ms at
    the ProgGAN 1024^2 tail shape). Precision.HIGHEST keeps the matmul exact
    in f32 (the layout-equality contract vs the NHWC path) at no measured
    cost; with bf16 activations the operands are exact either way."""
    m = lax.dot_general(
        x * x, jnp.asarray(_pn_mean_mat(x.shape[-1]), x.dtype),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    return (x.astype(jnp.float32) * lax.rsqrt(m + eps)).astype(x.dtype)
