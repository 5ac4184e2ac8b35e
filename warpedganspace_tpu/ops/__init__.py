"""Compute ops: RBF warp kernels, upfirdn2d, fused bias-activation."""

from warpedganspace_tpu.ops.rbf import (
    warp_grad,
    warp_value,
    warp_value_and_grad,
)
from warpedganspace_tpu.ops.fused_act import fused_leaky_relu
from warpedganspace_tpu.ops.upfirdn2d import upfirdn2d

__all__ = [
    "warp_grad",
    "warp_value",
    "warp_value_and_grad",
    "fused_leaky_relu",
    "upfirdn2d",
]
