"""Minimal functional NN layers: pure functions over parameter pytrees."""

from warpedganspace_tpu.nn import core
from warpedganspace_tpu.nn.core import (
    conv2d,
    linear,
    batch_norm,
    max_pool,
    avg_pool_global,
    upsample_nearest,
)

__all__ = [
    "core",
    "conv2d",
    "linear",
    "batch_norm",
    "max_pool",
    "avg_pool_global",
    "upsample_nearest",
]
