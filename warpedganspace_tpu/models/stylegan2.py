"""StyleGAN2 (config-f, FFHQ 256/1024) generator.

Behavioral parity with reference ``models/StyleGAN2/model.py``: 8-layer mapping
network with PixelNorm and equalized lr (lr_mul 0.01, :286-295), constant 4x4
input (:243-249), styled modulated/demodulated convs with blur-composed up-
sampling (:148-237, :252-267), fixed registered noise buffers (:325-329, used
when randomize_noise=False — the pipeline default, gan_load.py wrapper), skip-
accumulated ToRGB (:270-282), truncation (:370-374) and style mixing via
inject_index (:376-387).

TPU-first re-design (NOT a translation):

- The reference materializes per-sample conv weights and runs a grouped conv
  with groups=batch (model.py:187-228) — hostile to the MXU. Here modulation
  uses the exact linear-algebra factorization: conv(x, w * s_b) ==
  conv(x * s_b, w) for per-input-channel styles s_b, and demodulation is a
  per-(sample, out-channel) scalar computed as
  rsqrt(sum_i s_i^2 * W2[i,o] + eps) with W2[i,o] = sum_kh,kw w^2 — one tiny
  (B,in)x(in,out) matmul. Every sample shares ONE conv weight, so XLA tiles a
  single large convolution onto the MXU. NOTE: the reference adds eps *inside*
  rsqrt over the *scaled* weight (scale*w*style), which this reproduces
  exactly by folding the equalized-lr scale into w at conversion time.
- The stride-2 transposed conv (model.py:210-218) becomes an lhs-dilated
  convolution with the spatially-flipped kernel — the XLA-native form.
- upfirdn2d blurs use :mod:`warpedganspace_tpu.ops.upfirdn2d` (one fused XLA
  conv per blur; see that module).
- Equalized-lr runtime scales (EqualLinear :110-131, ModulatedConv :177-178)
  are folded into the stored weights by the converter — valid because the
  generator is frozen — so apply() touches each weight exactly once.

Activations NHWC; weights HWIO.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax

from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.ops.fused_act import fused_leaky_relu
from warpedganspace_tpu.ops import s2d as s2d_ops
from warpedganspace_tpu.ops.upfirdn2d import upfirdn2d

BLUR_KERNEL = (1.0, 3.0, 3.0, 1.0)


def _make_blur_kernel(gain: float = 1.0) -> jnp.ndarray:
    k = jnp.asarray(BLUR_KERNEL, dtype=jnp.float32)
    k = jnp.outer(k, k)
    return k / jnp.sum(k) * gain


def channels_dict(channel_multiplier: int = 2) -> dict[int, int]:
    """Per-resolution channel table (reference model.py:297-307)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def _modulate(w_hwio, style, demodulate: bool):
    """Per-sample modulation factors.

    Args:
        w_hwio: (kh, kw, in, out) scale-folded weight.
        style:  (B, in) modulation (output of the style EqualLinear).

    Returns (s, d): input scaling (B, in) and output demod (B, out) or None.
    """
    if not demodulate:
        return style, None
    w2 = jnp.sum(jnp.square(w_hwio), axis=(0, 1))  # (in, out)
    denom = jnp.square(style) @ w2                 # (B, out)
    d = lax.rsqrt(denom + 1e-8)
    return style, d


def _cvec(v, fmt):
    """Broadcast a (B, C) per-sample channel vector to the activation layout."""
    if fmt == "NCHW":
        return v[:, :, None, None]
    if fmt == "S2D":
        # s2d channel layout (phase_y, phase_x, c): the per-channel vector
        # repeats across the 4 phases.
        return jnp.tile(v, (1, 4))[:, None, None, :]
    return v[:, None, None, :]


# --------------------------------------------------------------------------- #
# Space-to-depth (S2D) tail.                                                   #
#                                                                              #
# TPU convolutions put features on the 128-wide lane dimension, so the 16-64   #
# channel high-resolution layers waste 2-8x HBM/bandwidth on lane padding (the #
# dominant cost: the 1024-res block alone is ~68% of a 1024^2 forward). In the #
# S2D representation an activation of resolution r with C channels is stored   #
# as (B, r/2, r/2, 4C) — full lanes, zero padding — with channel layout        #
# idx = (phase_y*2 + phase_x)*C + c, i.e. s2d[x][i, j, (py, px, c)] =          #
# x[2i+py, 2j+px, c]. Every tail op is re-derived as an exact convolution on   #
# the half grid (polyphase algebra; kernels built from the learned weights at  #
# trace time, cost negligible):                                                #
#                                                                              #
# - entry upsample conv (NHWC in, S2D out): the conv_transpose+blur composite  #
#   6x6 kernel split into its four 3x3 polyphase kernels, stacked on the       #
#   output-channel axis — a plain stride-1 conv on the input grid.             #
# - same-grid 3x3 conv (S2D -> S2D): output pixel 2i+dy reads full-grid taps   #
#   2i+dy+o, i.e. s2d block i + (dy+o-e)//2, phase e = (dy+o) mod 2 — a 3x3    #
#   block conv with a sparsity-structured (3,3,4C,4Co) kernel.                 #
# - upsample conv (S2D -> S2D, grids r/4 -> r/2): per output phase f the       #
#   composite's 3-tap polyphase kernel reads full-grid x[m+o'-1]; with         #
#   x full-grid index 2u+e this lands at dilated-kernel position k = o'+1-e,   #
#   giving a (4,4,4Cin,4Co) kernel applied with lhs_dilation 2, padding 2.     #
# - skip blur-upsamples: same two derivations with the 4-tap blur's 2-tap      #
#   polyphase kernels (entry: 3x3 kernel; in-s2d: 4x4 dilated kernel).         #
# - ToRGB 1x1: block-diagonal (1,1,4C,12) kernel (phases don't mix).           #
# --------------------------------------------------------------------------- #

_PHASE_ROWS = ([1, 3, 5], [0, 2, 4])  # composite-kernel rows per output phase


def _compose_upsample_kernel(w: jax.Array) -> jax.Array:
    """6x6 composite of the transposed-conv kernel with the 4-tap blur:
    C = flip(w (*) 4*blur) — exact algebra of corr(corr(., flip(w)), flip(4b))."""
    kh, kw, cin, cout = w.shape
    blur = _make_blur_kernel(gain=4.0)
    bl = blur.shape[0]
    io = cin * cout
    w_img = w.reshape(1, kh, kw, io)
    b_k = jnp.tile(jnp.flip(blur, (0, 1))[:, :, None, None], (1, 1, 1, io)).astype(w.dtype)
    full = lax.conv_general_dilated(
        w_img, b_k, window_strides=(1, 1),
        padding=((bl - 1, bl - 1), (bl - 1, bl - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=io,
    )[0]
    return jnp.flip(full, (0, 1)).reshape(kh + bl - 1, kw + bl - 1, cin, cout)


def _s2d_entry_conv_kernel(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Co) upsample weight -> (3,3,Cin,4Co) polyphase kernel
    (NHWC input grid -> S2D output on the same grid)."""
    comp = _compose_upsample_kernel(w)                 # (6, 6, Cin, Co)
    cin, co = comp.shape[2], comp.shape[3]
    rows = (jnp.array(_PHASE_ROWS[0]), jnp.array(_PHASE_ROWS[1]))
    phases = [comp[rows[fy]][:, rows[fx]] for fy in range(2) for fx in range(2)]
    return jnp.stack(phases, axis=3).reshape(3, 3, cin, 4 * co)


def _s2d_up_conv_kernel(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Co) upsample weight -> (4,4,4Cin,4Co) S2D->S2D kernel
    (applied with lhs_dilation 2, padding 2)."""
    comp = _compose_upsample_kernel(w)                 # (6, 6, Cin, Co)
    cin, co = comp.shape[2], comp.shape[3]
    k = jnp.zeros((4, 4, 4 * cin, 4 * co), dtype=w.dtype)
    for fy in range(2):
        for fx in range(2):
            f_idx = (fy * 2 + fx) * co
            for oy in range(3):
                for ox in range(3):
                    tap = comp[_PHASE_ROWS[fy][oy], _PHASE_ROWS[fx][ox]]  # (Cin, Co)
                    for ey in range(2):
                        for ex in range(2):
                            e_idx = (ey * 2 + ex) * cin
                            k = k.at[
                                oy + 1 - ey, ox + 1 - ex,
                                e_idx : e_idx + cin, f_idx : f_idx + co,
                            ].set(tap)
    return k


def _blur_taps():
    """Correlation taps of the upsample blur (flip of 4*blur), per output phase:
    [(full-grid offset, (ty, tx) tap index)] with phase f using t = f, f+2."""
    fb = jnp.flip(_make_blur_kernel(gain=4.0), (0, 1))
    # 1D: f=0 -> taps t=0 @ offset -1, t=2 @ offset 0; f=1 -> t=1 @ 0, t=3 @ +1.
    offs = {0: [(-1, 0), (0, 2)], 1: [(0, 1), (1, 3)]}
    return fb, offs


def _s2d_entry_blur_kernel(c: int, dtype) -> jax.Array:
    """Blur-upsample of an NHWC (.., c) map into its S2D rep on the same grid:
    (3,3,c,4c) kernel, padding 1."""
    fb, offs = _blur_taps()
    fb = fb.astype(dtype)  # else f32 taps scatter into a bf16 kernel (promotion error)
    k = jnp.zeros((3, 3, c, 4 * c), dtype=dtype)
    eye = jnp.eye(c, dtype=dtype)
    for fy in range(2):
        for fx in range(2):
            f_idx = (fy * 2 + fx) * c
            for (uy, ty) in offs[fy]:
                for (ux, tx) in offs[fx]:
                    k = k.at[uy + 1, ux + 1, :, f_idx : f_idx + c].set(
                        fb[ty, tx] * eye
                    )
    return k


def _s2d_up_blur_kernel(c: int, dtype) -> jax.Array:
    """Blur-upsample of an S2D map (grid g) to the next S2D level (grid 2g):
    (4,4,4c,4c) kernel, lhs_dilation 2, padding 2."""
    fb, offs = _blur_taps()
    fb = fb.astype(dtype)
    k = jnp.zeros((4, 4, 4 * c, 4 * c), dtype=dtype)
    eye = jnp.eye(c, dtype=dtype)
    for fy in range(2):
        for fx in range(2):
            f_idx = (fy * 2 + fx) * c
            for (uy, ty) in offs[fy]:
                for (ux, tx) in offs[fx]:
                    for ey in range(2):
                        for ex in range(2):
                            e_idx = (ey * 2 + ex) * c
                            k = k.at[
                                uy + 2 - ey, ux + 2 - ex,
                                e_idx : e_idx + c, f_idx : f_idx + c,
                            ].set(fb[ty, tx] * eye)
    return k


# --------------------------------------------------------------------------- #
# Fold-x tail ("foldx"): the 1D analog of S2D — activations (B, H, W/f, f*C)   #
# with f = 128/C, lane layout hx*C + c. Same 128-lane fill as S2D, but 1D      #
# folding halves the dense-FLOP factor of the same-grid convs at C=64 (2x vs  #
# 4x). Measured on v5e (B=24, deep-pipelined): the 512-res section's same-    #
# conv 15.8 -> 11.8 ms and its up-conv matches the S2D entry form; the C=32   #
# 1024-res layers tie with S2D. Inference layout (the training pair handoff   #
# wants out_layout='s2d'; build_stylegan2 auto-selects foldx on TPU for       #
# render, cli/train pins s2d). Kernels derived once per call from the learned  #
# weights, like the S2D family above.                                          #
# --------------------------------------------------------------------------- #


def _foldx_up_kernel(w: jax.Array, fi: int) -> jax.Array:
    """(3,3,Cin,Co) upsample weight -> (6,3, fi*Cin, 2fi*Co): the
    convT(stride2)+blur composite from fold-x input (fold fi) to fold-x
    output (fold 2fi). Apply with lhs_dilation=(2,1), padding=((3,3),(1,1)).

    y: out row Y reads input rows Y//2 - 1 + oy; as a y-dilated conv the tap
    lands at kernel row 1 - (Y%2) + 2*oy — exactly ``_PHASE_ROWS``. x: tap
    q = px//2 + ox - 1 lands in folded group q//fi at sub-position q%fi."""
    comp = _compose_upsample_kernel(w)  # (6, 6, Cin, Co)
    cin, co = comp.shape[2], comp.shape[3]
    fo = 2 * fi
    k = jnp.zeros((6, 3, fi * cin, fo * co), w.dtype)
    for f_y in range(2):
        for oy in range(3):
            ky = _PHASE_ROWS[f_y][oy]
            for px in range(fo):
                f_x = px % 2
                for ox in range(3):
                    q = px // 2 + ox - 1
                    k = k.at[ky, q // fi + 1,
                             (q % fi) * cin:(q % fi + 1) * cin,
                             px * co:(px + 1) * co].set(
                        comp[ky, _PHASE_ROWS[f_x][ox]])
    return k


def _foldx_up_blur_kernel(c: int, fi: int, dtype) -> jax.Array:
    """Blur-upsample of a fold-x map (fold fi) to fold 2fi on the doubled
    grid: (4,3, fi*c, 2fi*c), lhs_dilation=(2,1), padding=((2,2),(1,1)).
    y: tap row m + offy lands at kernel row 2 - (Y%2) + 2*offy."""
    fb, offs = _blur_taps()
    fb = fb.astype(dtype)
    fo = 2 * fi
    k = jnp.zeros((4, 3, fi * c, fo * c), dtype=dtype)
    eye = jnp.eye(c, dtype=dtype)
    for f_y in range(2):
        for (offy, ty) in offs[f_y]:
            ky = 2 - f_y + 2 * offy
            for px in range(fo):
                f_x = px % 2
                for (offx, tx) in offs[f_x]:
                    q = px // 2 + offx
                    k = k.at[ky, q // fi + 1,
                             (q % fi) * c:(q % fi + 1) * c,
                             px * c:(px + 1) * c].set(fb[ty, tx] * eye)
    return k


def _foldx_conv(x, k, up: bool):
    if up:
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1),
            padding=((k.shape[0] // 2, k.shape[0] // 2), (1, 1)),
            lhs_dilation=(2, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if k.shape[0] == 1:
        return lax.dot_general(x, k[0, 0], (((3,), (0,)), ((), ())))
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _cvec_fold(v, f):
    """(B, C) per-sample channel vector -> fold-x lane layout (tile f)."""
    return jnp.tile(v, (1, f))[:, None, None, :]


def modulated_conv2d(p: dict, x, style, demodulate: bool = True, upsample: bool = False,
                     fmt: str = "NHWC", entry: bool = False):
    """Styled conv: modulation -> conv (or lhs-dilated 'transposed' conv) ->
    demodulation [-> blur when upsampling].

    ``fmt`` selects the activation layout: the high-resolution synthesis tail
    has <=64 channels, which NHWC would pad to the 128-wide lane dimension
    (measured 5.3x HBM expansion at 1024^2); running it NCHW puts W on the
    lanes instead.
    """
    w = p["w"]  # (kh, kw, in, out), equalized-lr scale folded in
    kh = w.shape[0]
    s = nn.linear(p["mod"], style)  # (B, in); bias_init=1 folded in converter
    s, d = _modulate(w, s, demodulate)

    if fmt == "FOLDX":
        fi = x.shape[-1] // w.shape[2]  # current x-fold (1 at the entry block)
        x = x * _cvec_fold(s, fi)
        if upsample:
            k = _foldx_up_kernel(w, fi)
            fo = 2 * fi
        elif kh == 1:
            k = s2d_ops.fold_x_diag_1x1_kernel(w, fi)
            fo = fi
        else:
            k = s2d_ops.fold_x_same_conv_kernel(w, fi)
            fo = fi
        x = _foldx_conv(x, k, upsample)
        if d is not None:
            x = x * _cvec_fold(d, fo)
        return x

    if fmt == "S2D":
        # Blur is folded into the S2D kernels; demod is per-phase-tiled.
        x = x * (s[:, None, None, :] if entry else _cvec(s, "S2D"))
        if upsample and entry:
            k, dil, pad = _s2d_entry_conv_kernel(w), (1, 1), 1
        elif upsample:
            k, dil, pad = _s2d_up_conv_kernel(w), (2, 2), 2
        elif kh == 1:
            k, dil, pad = s2d_ops.diag_1x1_kernel(w), (1, 1), 0
        else:
            k, dil, pad = s2d_ops.same_conv_kernel(w), (1, 1), 1
        x = lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if d is not None:
            x = x * _cvec(d, "S2D")
        return x

    x = x * _cvec(s, fmt)
    if upsample:
        # conv_transpose(stride 2, pad 0) == lhs-dilated correlation with the
        # spatially flipped kernel, full (k-1) padding. Alternatives measured
        # on v5e and found SLOWER: fusing the 4x4 blur into a 6x6 dilated
        # kernel (127 vs 149 img/s f32 — dilated zeros quadruple MXU work) and
        # a polyphase/pixel-shuffle decomposition of that composite (111 f32 /
        # 138 bf16 vs 155 bf16) — XLA already optimizes the 3x3 dilation well.
        w_t = jnp.flip(w, axis=(0, 1))
        x = lax.conv_general_dilated(
            x,
            w_t,
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=(fmt, "HWIO", fmt),
        )
    else:
        pad = kh // 2
        x = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=(fmt, "HWIO", fmt),
        )
    if d is not None:
        x = x * _cvec(d, fmt)
    if upsample:
        # Blur: kernel gain factor^2=4, pad (1, 1) for k=3, f=2, blur len 4
        # (reference ModulatedConv2d :160-166).
        pad0 = (len(BLUR_KERNEL) - 2 - (kh - 1) + 1) // 2 + 1
        pad1 = (len(BLUR_KERNEL) - 2 - (kh - 1)) // 2 + 1
        x = upfirdn2d(x, _make_blur_kernel(gain=4.0), pad=(pad0, pad1), data_format=fmt)
    return x


def styled_conv(p: dict, x, style, noise=None, upsample: bool = False, fmt: str = "NHWC",
                entry: bool = False):
    """StyledConv: modulated conv + noise injection + fused bias/leaky-relu
    (reference :252-267). ``upsample``/``fmt``/``entry`` are static structure
    (convs alternate up/plain), NOT params leaves — a bool leaf would be traced
    under jit."""
    x = modulated_conv2d(p, x, style, demodulate=True, upsample=upsample, fmt=fmt,
                         entry=entry)
    if noise is not None:
        if fmt == "NCHW":
            noise = jnp.transpose(noise, (0, 3, 1, 2))  # (1, H, W, 1) -> (1, 1, H, W)
            x = x + p["noise_weight"] * noise
        elif fmt == "S2D":
            b, h, w, c4 = x.shape
            n_s2d = s2d_ops.to_s2d(noise)  # (1, h, w, 4)
            x = (x.reshape(b, h, w, 4, c4 // 4)
                 + p["noise_weight"] * n_s2d[..., None]).reshape(b, h, w, c4)
        elif fmt == "FOLDX":
            # noise (nb, H, W, 1) broadcasts over channels: fold x into
            # lanes, then repeat each folded pixel's value over the C true
            # channels — lane layout hx*C + c, no relayout of x.
            wg = x.shape[2]
            f = noise.shape[2] // wg
            n_f = noise.reshape(noise.shape[0], noise.shape[1], wg, f)
            x = x + p["noise_weight"] * jnp.repeat(n_f, x.shape[-1] // f, axis=-1)
        else:
            x = x + p["noise_weight"] * noise
    if fmt == "S2D":
        bias = jnp.tile(p["act_bias"], 4)
    elif fmt == "FOLDX":
        bias = jnp.tile(p["act_bias"], x.shape[-1] // p["act_bias"].shape[0])
    else:
        bias = p["act_bias"]
    return fused_leaky_relu(x, bias, channel_axis=1 if fmt == "NCHW" else -1)


def to_rgb(p: dict, x, style, skip=None, fmt: str = "NHWC", entry: bool = False):
    """ToRGB with skip accumulation through a blur-upsample (reference :270-282)."""
    out = modulated_conv2d(p, x, style, demodulate=False, upsample=False, fmt=fmt)
    if fmt == "NCHW":
        out = out + p["bias"][:, None, None]
    elif fmt == "S2D":
        out = out + jnp.tile(p["bias"], 4)
    elif fmt == "FOLDX":
        out = out + jnp.tile(p["bias"], out.shape[-1] // 3)
    else:
        out = out + p["bias"]
    if skip is not None:
        # Upsample(blur): kernel gain 4, pad0=(p+1)//2+f-1, pad1=p//2, p=len-2.
        if fmt == "FOLDX":
            fi = skip.shape[-1] // 3  # 1 at the entry block (plain NHWC skip)
            k = _foldx_up_blur_kernel(3, fi, skip.dtype)
            skip = _foldx_conv(skip, k, up=True)
        elif fmt == "S2D":
            c = skip.shape[-1] if entry else skip.shape[-1] // 4
            if entry:  # NHWC skip -> S2D skip on the same grid
                k, dil, pad = _s2d_entry_blur_kernel(c, skip.dtype), (1, 1), 1
            else:      # S2D skip -> S2D skip on the doubled grid
                k, dil, pad = _s2d_up_blur_kernel(c, skip.dtype), (2, 2), 2
            skip = lax.conv_general_dilated(
                skip, k, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
                lhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            skip = upfirdn2d(skip, _make_blur_kernel(gain=4.0), up=2, pad=(2, 1),
                             data_format=fmt)
        out = out + skip
    return out


# How many final tail sections run through the fused kernel (the earlier
# thin-channel sections run fold-x). Overridable for A/B measurement.
_PALLAS_SECTIONS = int(os.environ.get("WGS_SG2_PALLAS_SECTIONS", "99"))


def _pallas_tail_impl(gen, idx_lo, fmt_in, params, latent, noise, out, skip):
    """Fused Pallas tail: blocks [idx_lo, end) on NHWC carry ``out`` with the
    skip chain accumulated in the kernel's k-merged RGB layout
    (ops/sg2_tail_pallas.py). Returns the final skip (B, R, WG/k, k*3*fo)."""
    from warpedganspace_tpu.ops import sg2_tail_pallas as stp

    x = out  # fold-1 (the transition block's input has 2C = Cin channels)
    i = 1 + 2 * idx_lo
    n_idx = len(params["to_rgbs"])
    for idx in range(idx_lo, n_idx):
        cu = params["convs"][2 * idx]
        cs = params["convs"][2 * idx + 1]
        rgb_p = params["to_rgbs"][idx]
        s1, d1 = _modulate(cu["w"], nn.linear(cu["mod"], latent[:, i]), True)
        s2v, d2 = _modulate(cs["w"], nn.linear(cs["mod"], latent[:, i + 1]), True)
        s3 = nn.linear(rgb_p["mod"], latent[:, i + 2])
        want_x2 = idx < n_idx - 1
        res = stp.fused_section(
            x, cu["w"], cs["w"], rgb_p["w"], s1, d1, s2v, d2, s3,
            noise[2 * idx + 1], cu["noise_weight"], cu["act_bias"],
            noise[2 * idx + 2], cs["noise_weight"], cs["act_bias"],
            rgb_p["bias"], want_x2=want_x2)
        rgb_m, x = res if want_x2 else (res, None)
        # Skip chain: blur-upsample the accumulated skip directly INTO the
        # kernel's k-merged layout (a fold-x intermediate would materialize
        # the padded-tile thin-lane layout — measured +10-20 ms/batch96/hop).
        skip = rgb_m + stp.merged_skip_blur_up(skip, rgb_m.shape[-1] // 3)
        i += 2
    return skip


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _pallas_tail_op(gen, idx_lo, fmt_in, params, latent, noise, out, skip):
    return _pallas_tail_impl(gen, idx_lo, fmt_in, params, latent, noise, out,
                             skip)


def _pallas_tail_fwd(gen, idx_lo, fmt_in, params, latent, noise, out, skip):
    return (_pallas_tail_impl(gen, idx_lo, fmt_in, params, latent, noise, out,
                              skip),
            (params, latent, noise, out, skip))


def _pallas_tail_bwd(gen, idx_lo, fmt_in, res, ct):
    # Safety net only (renders never differentiate G; training uses the s2d
    # composition): the backward runs the exact fold-x twin.
    params, latent, noise, out, skip = res

    def twin(params, latent, noise, out, skip):
        g = dataclasses.replace(gen, tail_layout="foldx")
        _, sk, _ = g._synth_range(
            params, latent, noise, out, skip, idx_lo,
            len(params["to_rgbs"]), fmt_in)
        return sk.reshape(ct.shape)

    _, vjp = jax.vjp(twin, params, latent, noise, out, skip)
    return vjp(ct)


_pallas_tail_op.defvjp(_pallas_tail_fwd, _pallas_tail_bwd)


def _finish_skip(skip, fmt: str, out_layout: str):
    """Synthesis epilogue: convert the accumulated RGB skip from the tail's
    internal fmt to the requested output layout (shared by ``synthesis`` and
    ``apply_tail`` so the head/tail split and the straight path can't drift)."""
    if fmt == "NCHW":
        skip = jnp.transpose(skip, (0, 2, 3, 1))
    elif fmt == "S2D":
        if out_layout == "s2d":
            return skip
        skip = s2d_ops.from_s2d(skip)
    elif fmt == "FOLDX":
        skip = s2d_ops.unfold_x(skip, skip.shape[-1] // 3)  # pure reshape
    elif fmt == "PALLAS":
        # k-merged RGB (B, R, WG/k, k*3*fo): row-major in true x, so the
        # image is one logical reshape away.
        b, r, wgk, lanes = skip.shape
        skip = skip.reshape(b, r, wgk * lanes // 3, 3)
    if out_layout == "s2d":
        # Tail never entered S2D (small resolutions / nchw layout): pay one
        # transpose so the contract holds everywhere.
        skip = s2d_ops.to_s2d(skip)
    return skip


@dataclasses.dataclass(frozen=True)
class StyleGAN2Generator:
    resolution: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    shift_in_w_space: bool = False
    # Rematerialize per-resolution blocks during backprop-through-G (training
    # at 1024^2 with bs 8-12 otherwise exhausts HBM — SURVEY hard part #2).
    # True = checkpoint every block (max memory savings); "tail" = checkpoint
    # only the <128-channel high-resolution blocks (the memory hogs) and store
    # the cheap low-res activations, trading a little HBM for less backward
    # recompute; False = store everything.
    remat: bool | str = False
    # Layout of the <128-channel high-resolution tail: "s2d" (space-to-depth;
    # the training default — the pair handoff consumes s2d output), "foldx"
    # (1D x-fold; the PRODUCTION render layout on TPU), "nchw", "nhwc"
    # (plain), or "pallas" (fused section kernel, ops/sg2_tail_pallas.py —
    # EXPERIMENTAL: beats the isolated fold-x sections by 12-16% at B=96 bf16
    # but loses end-to-end (240 vs 202 ms) to XLA's cross-block fusion plus
    # the layout-conversion copies XLA inserts at every pallas boundary; see
    # PERFORMANCE.md "The fused StyleGAN2 tail kernel". Falls back to "s2d"
    # for out_layout="s2d" and to "foldx" for randomized/explicit noise or
    # partial head/tail ranges, with a fold-x custom_vjp so gradients stay
    # exact).
    tail_layout: str = "s2d"

    @property
    def dim_z(self) -> int:
        return 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    # --------------------------------------------------------------------- init
    def init(self, key: jax.Array) -> dict:
        """Random init with the same distributions/scale-folding the converter
        produces (weights ~ N(0, scale^2))."""
        ch = channels_dict(self.channel_multiplier)
        keys = iter(jax.random.split(key, 256))

        def eq_linear(in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
            scale = (1.0 / math.sqrt(in_dim)) * lr_mul
            return {
                "w": jax.random.normal(next(keys), (in_dim, out_dim)) / lr_mul * scale,
                "b": jnp.full((out_dim,), bias_init),
            }

        def styled(in_ch, out_ch, k):
            scale = 1.0 / math.sqrt(in_ch * k * k)
            return {
                "w": jax.random.normal(next(keys), (k, k, in_ch, out_ch)) * scale,
                "mod": eq_linear(self.style_dim, in_ch, bias_init=1.0),
                "noise_weight": jnp.zeros(()),
                "act_bias": jnp.zeros((out_ch,)),
            }

        def rgb(in_ch):
            scale = 1.0 / math.sqrt(in_ch)
            return {
                "w": jax.random.normal(next(keys), (1, 1, in_ch, 3)) * scale,
                "mod": eq_linear(self.style_dim, in_ch, bias_init=1.0),
                "bias": jnp.zeros((3,)),
            }

        params = {
            "mapping": [
                eq_linear(self.style_dim, self.style_dim, lr_mul=0.01)
                for _ in range(self.n_mlp)
            ],
            "const_input": jax.random.normal(next(keys), (1, 4, 4, ch[4])),
            "conv1": styled(ch[4], ch[4], 3),
            "to_rgb1": rgb(ch[4]),
            "convs": [],
            "to_rgbs": [],
            "noises": [
                jax.random.normal(
                    next(keys), (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1)
                )
                for i in range(self.num_layers)
            ],
        }
        in_ch = ch[4]
        for i in range(3, self.log_size + 1):
            out_ch = ch[2**i]
            params["convs"].append(styled(in_ch, out_ch, 3))
            params["convs"].append(styled(out_ch, out_ch, 3))
            params["to_rgbs"].append(rgb(out_ch))
            in_ch = out_ch
        return params

    # ------------------------------------------------------------------ mapping
    def style(self, params: dict, z: jax.Array) -> jax.Array:
        """Mapping network Z -> W: PixelNorm + 8x EqualLinear(fused lrelu)
        (reference :286-295; ``get_latent`` :356-357)."""
        x = nn.pixel_norm(z)
        for layer in params["mapping"]:
            x = nn.linear(layer, x)
            # EqualLinear fused activation: bias is added pre-activation by
            # nn.linear (bias folded with lr_mul), so only the gain remains.
            x = fused_leaky_relu(x, None)
        return x

    def get_w(self, params: dict, z: jax.Array) -> jax.Array:
        return self.style(params, z)

    def mean_latent(self, params: dict, key: jax.Array, n_latent: int) -> jax.Array:
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style(params, z), axis=0, keepdims=True)

    # ---------------------------------------------------------------- synthesis
    def synthesis(
        self,
        params: dict,
        latent: jax.Array,
        noise=None,
        randomize_noise: bool = False,
        noise_key=None,
        out_layout: str = "nhwc",
    ) -> jax.Array:
        """Run the synthesis network on per-layer W latents (B, n_latent, 512).

        ``out_layout='s2d'`` returns the image in S2D layout (B, H/2, W/2, 12)
        — free when the tail already runs S2D (skips the final ``from_s2d``
        transpose); the training step hands this straight to the
        reconstructor's S2D stem (``Reconstructor.apply_pair_s2d``).
        """
        if self.tail_layout not in ("s2d", "nchw", "nhwc", "foldx", "pallas"):
            raise ValueError(f"unknown tail_layout {self.tail_layout!r}")
        if out_layout not in ("nhwc", "s2d"):
            raise ValueError(f"unknown out_layout {out_layout!r}")
        if self.remat not in (True, False, "tail"):
            raise ValueError(f"unknown remat policy {self.remat!r}")
        if self.tail_layout == "pallas":
            if out_layout == "s2d":
                # The pair-handoff training path stays on the autodiff-native
                # s2d composition (the kernel is an inference fast path).
                return dataclasses.replace(self, tail_layout="s2d").synthesis(
                    params, latent, noise, randomize_noise, noise_key, out_layout)
            if randomize_noise or noise is not None:
                # The kernel bakes the FIXED noise buffers into its epilogue
                # maps; random/explicit noise runs the fold-x composition.
                return dataclasses.replace(self, tail_layout="foldx").synthesis(
                    params, latent, noise, randomize_noise, noise_key, out_layout)
        b = latent.shape[0]
        if noise is None:
            if randomize_noise:
                keys = jax.random.split(
                    noise_key if noise_key is not None else jax.random.key(0),
                    self.num_layers,
                )
                noise = [
                    jax.random.normal(keys[i], (b,) + params["noises"][i].shape[1:])
                    for i in range(self.num_layers)
                ]
            else:
                noise = params["noises"]

        out = jnp.tile(params["const_input"], (b, 1, 1, 1))
        out = styled_conv(params["conv1"], out, latent[:, 0], noise[0])
        skip = to_rgb(params["to_rgb1"], out, latent[:, 1])
        out, skip, fmt = self._synth_range(
            params, latent, noise, out, skip, 0, len(params["to_rgbs"]), "NHWC")
        return _finish_skip(skip, fmt, out_layout)

    def _synth_range(self, params, latent, noise, out, skip, idx_lo, idx_hi, fmt):
        """Run synthesis blocks [idx_lo, idx_hi) carrying (out, skip, fmt).

        The head/tail split used by the train step's low-res batch fusion
        re-enters here; ``fmt`` at a given idx is a pure function of the
        resolution schedule, so resuming mid-stream is exact."""
        ch = channels_dict(self.channel_multiplier)

        def make_block(remat_this):
            def block(block_params, out, skip, lat3, n1, n2, fmt, entry):
                conv_up, conv, rgb = block_params
                sc = styled_conv
                rg = to_rgb
                if remat_this:
                    # Per-op remat: the backward then holds ONE high-res temp
                    # set at a time (at 1024^2 the conv temps are lane-padded
                    # to ~4GB each regardless of batch — XLA assigns
                    # feature-minor conv layouts — so per-block remat still
                    # OOMs a 16GB chip; the S2D tail removes that padding
                    # entirely).
                    sc = jax.checkpoint(styled_conv, static_argnums=(4, 5, 6))
                    rg = jax.checkpoint(to_rgb, static_argnums=(4, 5))
                out = sc(conv_up, out, lat3[:, 0], n1, True, fmt, entry)
                out = sc(conv, out, lat3[:, 1], n2, False, fmt, False)
                skip = rg(rgb, out, lat3[:, 2], skip, fmt, entry)
                return out, skip

            if remat_this:
                block = jax.checkpoint(block, static_argnums=(6, 7))
            return block

        blocks = {True: make_block(True), False: make_block(False)}

        i = 1 + 2 * idx_lo
        for idx in range(idx_lo, idx_hi):
            res = 2 ** (idx + 3)
            entry = False
            # Re-lay-out the <128-channel tail: NHWC pads C to the 128-wide
            # lane dimension there (measured 4-5x HBM/bandwidth waste).
            if self.tail_layout == "pallas" and ch[res] < 128 and \
                    fmt in ("NHWC", "FOLDX") and idx_hi == len(params["to_rgbs"]) \
                    and len(params["to_rgbs"]) - idx <= _PALLAS_SECTIONS:
                skip = _pallas_tail_op(
                    self, idx, fmt, params, latent, list(noise), out, skip)
                return None, skip, "PALLAS"
            if fmt == "NHWC" and ch[res] < 128:
                if self.tail_layout == "pallas":
                    # Earlier thin-channel blocks (and partial head/tail
                    # ranges) keep the exact fold-x composition.
                    fmt = "FOLDX"
                elif self.tail_layout == "s2d":
                    # The upsample conv of this block performs the NHWC -> S2D
                    # transition for the main path; ToRGB does it for skip.
                    fmt, entry = "S2D", True
                elif self.tail_layout == "foldx":
                    # No explicit entry step: the fold factor is derived from
                    # the activation lanes per op (fold 1 == plain NHWC at the
                    # transition block), so the up-conv/blur kernels fold as
                    # they upsample.
                    fmt = "FOLDX"
                elif self.tail_layout == "nchw":
                    out = jnp.transpose(out, (0, 3, 1, 2))
                    skip = jnp.transpose(skip, (0, 3, 1, 2))
                    fmt = "NCHW"
            block_params = (
                params["convs"][2 * idx],
                params["convs"][2 * idx + 1],
                params["to_rgbs"][idx],
            )
            remat_this = (self.remat is True) or (self.remat == "tail" and ch[res] < 128)
            out, skip = blocks[remat_this](
                block_params, out, skip, latent[:, i : i + 3],
                noise[2 * idx + 1], noise[2 * idx + 2], fmt, entry,
            )
            i += 2
        return out, skip, fmt

    # ----------------------------------------------------- head/tail split
    # The train step runs TWO forwards per iteration (G(z), G(z, shift)). At
    # the reference bs=12 the low-resolution blocks underfill the chip; the
    # head/tail split lets the step batch both forwards' heads as ONE 2B pass
    # (better occupancy, one dispatch chain) and then split for the expensive
    # high-res tail — whose backward must stay at B (the NOTES.md-rejected
    # full-2B fusion differentiates the whole 2B batch; the head is cheap
    # enough that its 2B backward is noise).

    def _head_idx(self, stop_res: int) -> int:
        ch = channels_dict(self.channel_multiplier)
        idx_hi = int(math.log2(stop_res)) - 2  # blocks cover res 8..stop_res
        if not 0 <= idx_hi <= len(range(3, self.log_size + 1)):
            raise ValueError(f"stop_res {stop_res} out of range")
        # With an 'nhwc' tail fmt never transitions, so any split is exact;
        # the s2d/nchw layouts switch fmt at the first <128-channel block and
        # the head must end before that.
        if self.tail_layout != "nhwc" and any(
            ch[2 ** (i + 3)] < 128 for i in range(idx_hi)
        ):
            raise ValueError(
                f"stop_res {stop_res} crosses the tail-layout transition")
        return idx_hi

    def apply_head(self, params: dict, z: jax.Array, shift=None,
                   latent_is_w: bool = False, stop_res: int = 64):
        """``apply`` up to (and including) the ``stop_res`` block: returns the
        (out, skip, latent) carry that ``apply_tail`` resumes from."""
        if self.shift_in_w_space:
            w = z if latent_is_w else self.style(params, z)
            if shift is not None:
                w = w + shift
        else:
            if shift is not None:
                z = z + shift
            w = self.style(params, z)
        latent = jnp.repeat(w[:, None, :], self.n_latent, axis=1)
        noise = params["noises"]
        b = z.shape[0]
        out = jnp.tile(params["const_input"], (b, 1, 1, 1))
        out = styled_conv(params["conv1"], out, latent[:, 0], noise[0])
        skip = to_rgb(params["to_rgb1"], out, latent[:, 1])
        out, skip, _ = self._synth_range(
            params, latent, noise, out, skip, 0, self._head_idx(stop_res), "NHWC")
        return out, skip, latent

    def apply_tail(self, params: dict, head_state, stop_res: int = 64,
                   out_layout: str = "nhwc"):
        """Resume from an ``apply_head`` carry and finish the synthesis."""
        out, skip, latent = head_state
        out, skip, fmt = self._synth_range(
            params, latent, params["noises"], out, skip,
            self._head_idx(stop_res), len(params["to_rgbs"]), "NHWC")
        return _finish_skip(skip, fmt, out_layout)

    def forward(
        self,
        params: dict,
        styles,
        input_is_latent: bool = False,
        inject_index: int | None = None,
        truncation: float = 1.0,
        truncation_latent=None,
        noise=None,
        randomize_noise: bool = False,
        out_layout: str = "nhwc",
    ) -> jax.Array:
        """Full forward with style mixing / truncation (reference :359-403).

        ``styles`` is a list of (B, 512) latents, as in the reference. With two
        styles, ``inject_index`` must be given explicitly (the reference draws
        it with Python's RNG at trace-incompatible call time; pass it in).
        """
        if not input_is_latent:
            styles = [self.style(params, s) for s in styles]
        if truncation < 1.0:
            styles = [
                truncation_latent + truncation * (s - truncation_latent) for s in styles
            ]
        if len(styles) < 2:
            latent = jnp.repeat(styles[0][:, None, :], self.n_latent, axis=1)
        else:
            if inject_index is None:
                inject_index = self.n_latent // 2
            l1 = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None, :], self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)
        return self.synthesis(
            params, latent, noise=noise, randomize_noise=randomize_noise,
            out_layout=out_layout,
        )

    # -------------------------------------------------------- uniform G contract
    def make_noise(self, key: jax.Array):
        """Fresh per-layer noise buffers (reference Generator.make_noise :333-342)."""
        keys = jax.random.split(key, self.num_layers)
        return [
            jax.random.normal(keys[i], (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
            for i in range(self.num_layers)
        ]

    def apply(self, params: dict, z: jax.Array, shift=None, latent_is_w: bool = False,
              out_layout: str = "nhwc"):
        """Uniform wrapper contract (reference StyleGAN2Wrapper.forward,
        models/gan_load.py:157-179): shifts live in W-space when
        ``shift_in_w_space``, else in Z-space."""
        if self.shift_in_w_space:
            w = z if latent_is_w else self.style(params, z)
            if shift is not None:
                w = w + shift
            return self.forward(params, [w], input_is_latent=True,
                                out_layout=out_layout)
        if shift is not None:
            z = z + shift
        return self.forward(params, [z], input_is_latent=False,
                            out_layout=out_layout)


# =========================================================================== #
#  Discriminator (reference model.py:453-503 — unused by the WarpedGANSpace   #
#  pipeline but part of the model family surface).                            #
# =========================================================================== #


def _conv_layer(p: dict, x, downsample: bool, activate: bool = True):
    """ConvLayer (reference :424-450): [blur +] equal-conv [+ fused lrelu].
    Equalized-lr scales are folded into ``w`` at conversion."""
    k = p["w"].shape[0]
    if downsample:
        # Blur pad: pl = (p+1)//2, pr = p//2 with p = len(blur)-2 + (k-1).
        pb = (len(BLUR_KERNEL) - 2) + (k - 1)
        x = upfirdn2d(x, _make_blur_kernel(), pad=((pb + 1) // 2, pb // 2))
        x = lax.conv_general_dilated(
            x, p["w"], window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        pad = k // 2
        x = lax.conv_general_dilated(
            x, p["w"], window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if activate:
        x = fused_leaky_relu(x, p.get("act_bias"))
    elif "b" in p:
        x = x + p["b"]
    return x


def _d_res_block(p: dict, x):
    """ResBlock (reference :439-450): conv -> downsample conv, blur-conv skip,
    sum scaled by 1/sqrt(2)."""
    out = _conv_layer(p["conv1"], x, downsample=False)
    out = _conv_layer(p["conv2"], out, downsample=True)
    skip = _conv_layer(p["skip"], x, downsample=True, activate=False)
    return (out + skip) / math.sqrt(2.0)


def _minibatch_stddev(x, group_size: int = 4, eps: float = 1e-8):
    """Minibatch stddev feature (reference :489-495), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, b // group, h, w, c)
    std = jnp.sqrt(jnp.var(y, axis=0) + eps)            # (b/group, h, w, c)
    s = jnp.mean(std, axis=(1, 2, 3), keepdims=True)    # (b/group, 1, 1, 1)
    s = jnp.tile(s, (group, h, w, 1))                   # (b, h, w, 1)
    return jnp.concatenate([x, s], axis=-1)


@dataclasses.dataclass(frozen=True)
class StyleGAN2Discriminator:
    resolution: int = 1024
    channel_multiplier: int = 2

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    def init(self, key: jax.Array) -> dict:
        ch = channels_dict(self.channel_multiplier)
        keys = iter(jax.random.split(key, 64))

        def conv(i, o, k, act=True):
            p = {"w": jax.random.normal(next(keys), (k, k, i, o)) / math.sqrt(i * k * k)}
            if act:
                p["act_bias"] = jnp.zeros((o,))
            return p

        def eq_linear(i, o, bias_init=0.0):
            return {
                "w": jax.random.normal(next(keys), (i, o)) / math.sqrt(i),
                "b": jnp.full((o,), bias_init),
            }

        params = {"conv_in": conv(3, ch[self.resolution], 1), "blocks": []}
        in_ch = ch[self.resolution]
        for i in range(self.log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            params["blocks"].append(
                {
                    "conv1": conv(in_ch, in_ch, 3),
                    "conv2": conv(in_ch, out_ch, 3),
                    "skip": {"w": jax.random.normal(next(keys), (1, 1, in_ch, out_ch))
                             / math.sqrt(in_ch)},
                }
            )
            in_ch = out_ch
        params["final_conv"] = conv(in_ch + 1, ch[4], 3)
        params["final_linear1"] = eq_linear(ch[4] * 16, ch[4])
        params["final_linear2"] = eq_linear(ch[4], 1)
        return params

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, 1) realness logits."""
        b = x.shape[0]
        h = _conv_layer(params["conv_in"], x, downsample=False)
        for bp in params["blocks"]:
            h = _d_res_block(bp, h)
        h = _minibatch_stddev(h)
        h = _conv_layer(params["final_conv"], h, downsample=False)
        # Torch flattens NCHW C-order before the linear head.
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        h = nn.linear(params["final_linear1"], h)
        h = fused_leaky_relu(h, None)
        return nn.linear(params["final_linear2"], h)
