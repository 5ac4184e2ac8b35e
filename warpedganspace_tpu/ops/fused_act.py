"""Fused bias + leaky-ReLU + scale.

TPU-native equivalent of the reference CUDA op ``fused_bias_act``
(models/StyleGAN2/op/fused_bias_act_kernel.cu:18-99, python wrapper
op/fused_act.py:19-86): out = scale * leaky_relu(x + bias).

On TPU this is a single VPU-fused elementwise expression — XLA fuses the
bias-add, select and scale into the producing matmul/conv epilogue, so a
hand-written kernel would only add launch overhead. Autodiff through this
expression reproduces the reference's first- and second-order gradients
(the CUDA switch table at fused_bias_act_kernel.cu:36-45) automatically.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = -1,
) -> jax.Array:
    """scale * leaky_relu(x + bias), bias broadcast along ``channel_axis``.

    The reference applies this after every StyleGAN2 conv/linear
    (models/StyleGAN2/op/fused_act.py:73-86) with scale = sqrt(2).
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return scale * jnp.where(x >= 0, x, negative_slope * x)
