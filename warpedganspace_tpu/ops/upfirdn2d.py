"""upfirdn2d: fused upsample -> pad -> FIR filter -> downsample.

TPU-native equivalent of the reference CUDA kernel
(models/StyleGAN2/op/upfirdn2d_kernel.cu:52-272, python wrapper
op/upfirdn2d.py:144-186). Semantics match ``upfirdn2d_native``
(op/upfirdn2d.py:152-186):

1. zero-stuff each spatial sample with (up-1) zeros *after* it (so each
   dimension grows to in*up),
2. apply edge padding (pad0 before, pad1 after; negative values crop),
3. correlate with the flipped 2D FIR kernel (i.e. convolve with the kernel),
4. keep every ``down``-th output sample.

Output spatial size: (in*up + pad0 + pad1 - kernel)//down + 1.

Implementation: a single ``lax.conv_general_dilated`` expresses all four steps —
``lhs_dilation`` performs the zero-stuffing, the padding config performs the
(possibly negative) edge padding plus the (up-1) trailing zeros, and
``window_strides`` performs the down-sampling. XLA lowers this to one fused
convolution; since generators are frozen, gradients w.r.t. the *input* (needed
for backprop-through-G during training, reference trainer.py:250) come from JAX
autodiff of this convolution — no hand-written backward kernel is required.

Layout is NHWC (TPU-preferred); the FIR filter is shared across channels via a
depthwise (grouped) convolution so channels stay vectorized in the lane
dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("up", "down", "pad", "data_format"))
def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    pad: tuple[int, ...] = (0, 0),
    data_format: str = "NHWC",
) -> jax.Array:
    """Apply upfirdn to an NHWC (or NCHW) tensor.

    Args:
        x:      (B, H, W, C) input (or (B, C, H, W) with data_format="NCHW" —
                the layout used for the small-channel high-resolution synthesis
                tail, where NHWC would pad channels to the 128 lane width).
        kernel: (kh, kw) FIR filter (not flipped; matches reference call sites).
        up:     int or (up_y, up_x) upsampling factor.
        down:   int or (down_y, down_x) downsampling factor.
        pad:    (pad0, pad1) applied to both axes, or (pad_x0, pad_x1, pad_y0,
                pad_y1) — the reference wrapper's convention
                (op/upfirdn2d.py:144-149).

    Returns:
        filtered tensor in the same layout.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    c = x.shape[-1] if data_format == "NHWC" else x.shape[1]
    kh, kw = kernel.shape
    # Correlating with the flipped kernel == convolving with the kernel; XLA's
    # conv op correlates, so pass the flipped kernel like the reference does
    # (op/upfirdn2d.py:180).
    w = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    w = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise

    # Zero-stuffing appends (up-1) zeros after *every* sample including the
    # last; lhs_dilation only inserts between samples, so fold the trailing
    # zeros into the high edge padding.
    padding = (
        (pad_y0, pad_y1 + (up_y - 1)),
        (pad_x0, pad_x1 + (up_x - 1)),
    )
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=padding,
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=(data_format, "HWIO", data_format),
        feature_group_count=c,
    )


def setup_filter(kernel, gain: float = 1.0) -> jax.Array:
    """Normalize a 1D/2D FIR filter the way the reference does
    (models/StyleGAN2/model.py ``make_kernel``): outer-product 1D filters and
    normalize to unit sum, then scale by ``gain``."""
    k = jnp.asarray(kernel, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    k = k / jnp.sum(k)
    return k * gain
