"""Functional NN primitives for the generator zoo and reconstructors.

Design: every layer is a pure function ``f(params, x, ...) -> y`` over a dict
pytree of arrays. Layouts are TPU-native — activations NHWC, conv kernels HWIO —
so XLA tiles convs straight onto the MXU; torch OIHW/NCHW weights are transposed
once at conversion time (:mod:`warpedganspace_tpu.convert`).

BatchNorm follows torch semantics exactly (momentum 0.1, eps 1e-5, biased batch
variance for normalization but *unbiased* variance accumulated into running
stats) so converted checkpoints behave identically. Cross-replica ("sync") BN —
the TPU equivalent of the reference's thread/queue SynchronizedBatchNorm
(models/BigGAN/sync_batchnorm/batchnorm.py:48-158) — is a ``lax.pmean`` of the
batch moments over a named mesh axis, enabled by passing ``axis_name``.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# --------------------------------------------------------------------------- init


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """Glorot/Xavier uniform init (torch nn.init.xavier_uniform_ semantics).

    For conv kernels in HWIO, fan_in = H*W*I, fan_out = H*W*O; for linear
    (in, out), fan_in = in, fan_out = out.
    """
    if len(shape) == 4:
        h, w, i, o = shape
        fan_in, fan_out = h * w * i, h * w * o
    elif len(shape) == 2:
        fan_in, fan_out = shape
    else:
        raise ValueError(f"unsupported shape {shape}")
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def kaiming_normal(key, shape, mode: str = "fan_out", nonlinearity: str = "relu", dtype=jnp.float32):
    """He/Kaiming normal init (torch nn.init.kaiming_normal_ semantics)."""
    if len(shape) == 4:
        h, w, i, o = shape
        fan_in, fan_out = h * w * i, h * w * o
    elif len(shape) == 2:
        fan_in, fan_out = shape
    else:
        raise ValueError(f"unsupported shape {shape}")
    fan = fan_out if mode == "fan_out" else fan_in
    gain = math.sqrt(2.0) if nonlinearity in ("relu", "leaky_relu") else 1.0
    return gain / math.sqrt(fan) * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """Torch's default Conv2d/Linear weight init (kaiming_uniform with a=sqrt 5)."""
    if len(shape) == 4:
        h, w, i, o = shape
        fan_in = h * w * i
    elif len(shape) == 2:
        fan_in = shape[0]
    else:
        raise ValueError(f"unsupported shape {shape}")
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform_bias(key, fan_in: int, size: int, dtype=jnp.float32):
    """Torch's default bias init: U[-1/sqrt(fan_in), 1/sqrt(fan_in)]."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (size,), dtype, minval=-bound, maxval=bound)


# ------------------------------------------------------------------------- layers


def conv2d(
    params: dict,
    x: jax.Array,
    stride: int | tuple[int, int] = 1,
    padding: int | str | Sequence[tuple[int, int]] = 0,
    feature_group_count: int = 1,
    dilation: int | tuple[int, int] = 1,
) -> jax.Array:
    """2D convolution (cross-correlation, torch-compatible). x NHWC, w HWIO."""
    w = params["w"]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    b = params.get("b")
    if b is not None:
        y = y + b.reshape(1, 1, 1, -1)
    return y


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True) -> dict:
    """Torch-default-initialized conv params (HWIO)."""
    kw, kb = jax.random.split(key)
    p = {"w": kaiming_uniform(kw, (kernel, kernel, in_ch, out_ch))}
    if bias:
        p["b"] = uniform_bias(kb, in_ch * kernel * kernel, out_ch)
    return p


def linear(params: dict, x: jax.Array) -> jax.Array:
    """Dense layer. x (..., in), w (in, out)."""
    y = jnp.dot(x, params["w"], preferred_element_type=x.dtype)
    b = params.get("b")
    if b is not None:
        y = y + b
    return y


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": kaiming_uniform(kw, (in_dim, out_dim))}
    if bias:
        p["b"] = uniform_bias(kb, in_dim, out_dim)
    return p


def batch_norm(
    params: dict,
    x: jax.Array,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis_name: str | None = None,
):
    """BatchNorm over all axes but the last (channel), torch semantics.

    params: {"scale", "bias", "mean", "var"} — running stats live in the same
    pytree (they are just leaves; frozen generators never update them).

    Returns ``y`` in eval mode; ``(y, new_params)`` in train mode, where
    new_params carries the updated running stats (torch: unbiased batch var in
    running stats, biased var for normalization).

    With ``axis_name`` set (inside shard_map/pmap), batch moments are averaged
    across replicas first — the one-line TPU equivalent of the reference's
    SynchronizedBatchNorm master/slave reduce-broadcast
    (models/BigGAN/sync_batchnorm/comm.py:56-137).

    Mixed precision: with a non-float32 ``x`` (bf16 reconstructor path), the
    moments, running stats and the per-channel affine are computed in float32
    and applied as one fused ``x*A + B`` in x's dtype, so the (bandwidth-bound)
    activation traffic stays half-width while the statistics stay exact.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    low_precision = x.dtype != jnp.float32
    if not train:
        mean, var = params["mean"], params["var"]
        inv = lax.rsqrt(var + eps)
        if low_precision:
            a = inv * params["scale"]
            b = params["bias"] - mean * a
            return x * a.astype(x.dtype) + b.astype(x.dtype)
        return (x - mean) * inv * params["scale"] + params["bias"]

    mean = jnp.mean(x, axis=reduce_axes, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x), axis=reduce_axes, dtype=jnp.float32)
    n = x.size // x.shape[-1]
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
        n = n * lax.psum(1, axis_name)
    var = mean_sq - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    if low_precision:
        a = inv * params["scale"]
        b = params["bias"] - mean * a
        y = x * a.astype(x.dtype) + b.astype(x.dtype)
    else:
        y = (x - mean) * inv * params["scale"] + params["bias"]
    unbiased = var * n / max(n - 1, 1)
    new_params = dict(params)
    new_params["mean"] = (1 - momentum) * params["mean"] + momentum * mean
    new_params["var"] = (1 - momentum) * params["var"] + momentum * unbiased
    return y, new_params


def batch_norm_init(num_features: int) -> dict:
    return {
        "scale": jnp.ones((num_features,)),
        "bias": jnp.zeros((num_features,)),
        "mean": jnp.zeros((num_features,)),
        "var": jnp.ones((num_features,)),
    }


def max_pool(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """Max pooling, NHWC, VALID padding (torch MaxPool2d default)."""
    return lax.reduce_window(
        x,
        x.dtype.type(-jnp.inf),
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def avg_pool_global(x: jax.Array, dtype=None) -> jax.Array:
    """Global average pool over spatial dims: (B, H, W, C) -> (B, C).

    Pass ``dtype=jnp.float32`` on low-precision inputs to accumulate (and
    return) in f32 — the reconstructor heads rely on this.
    """
    return jnp.mean(x, axis=(1, 2), dtype=dtype)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbor 2x upsampling (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def pixel_norm(x: jax.Array, eps: float = 1e-8, axis: int = -1) -> jax.Array:
    """PixelNorm: x / sqrt(mean(x^2) + eps) over channels
    (reference models/ProgGAN/model.py:12-18)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
