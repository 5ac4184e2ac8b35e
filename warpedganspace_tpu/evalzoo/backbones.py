"""Shared functional ResNet backbone (torchvision layout) for the eval zoo.

Implements BasicBlock (resnet18/34) and Bottleneck (resnet50) residual stacks
with torchvision state-dict naming, used by FairFace (resnet34), Hopenet
(resnet50 trunk, reference lib/evaluation/hopenet/hopenet.py:5-66) and the
CelebA attribute predictor (resnet50 trunk,
lib/evaluation/celeba_attributes/celeba_attr_predictor.py:106-191).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from warpedganspace_tpu.nn import core as nn

RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
RESNET_BLOCK = {18: "basic", 34: "basic", 50: "bottleneck"}


# ------------------------------------------------------------------- converters


def _conv_w(w):
    return jnp.asarray(np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0)))


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(np.asarray(sd[prefix + ".weight"], dtype=np.float32)),
        "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"], dtype=np.float32)),
        "mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"], dtype=np.float32)),
        "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"], dtype=np.float32)),
    }


def _lin(sd, prefix):
    p = {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"], dtype=np.float32).T)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], dtype=np.float32))
    return p


def resnet_trunk_from_state_dict(sd: dict, depth: int, prefix: str = "") -> dict:
    """Convert a torchvision-style ResNet trunk (conv1/bn1/layer1..4)."""
    block = RESNET_BLOCK[depth]
    params = {
        "conv1": {"w": _conv_w(sd[prefix + "conv1.weight"])},
        "bn1": _bn(sd, prefix + "bn1"),
    }
    for li, n_blocks in enumerate(RESNET_LAYERS[depth], start=1):
        blocks = []
        for bi in range(n_blocks):
            p = f"{prefix}layer{li}.{bi}."
            bp = {
                "conv1": {"w": _conv_w(sd[p + "conv1.weight"])},
                "bn1": _bn(sd, p + "bn1"),
                "conv2": {"w": _conv_w(sd[p + "conv2.weight"])},
                "bn2": _bn(sd, p + "bn2"),
            }
            if block == "bottleneck":
                bp["conv3"] = {"w": _conv_w(sd[p + "conv3.weight"])}
                bp["bn3"] = _bn(sd, p + "bn3")
            if p + "downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": {"w": _conv_w(sd[p + "downsample.0.weight"])},
                    "bn": _bn(sd, p + "downsample.1"),
                }
            blocks.append(bp)
        params[f"layer{li}"] = blocks
    return params


# ------------------------------------------------------------------- forward


def _basic(p: dict, x, stride: int):
    identity = x
    y = nn.conv2d(p["conv1"], x, stride=stride, padding=1)
    y = jax.nn.relu(nn.batch_norm(p["bn1"], y))
    y = nn.conv2d(p["conv2"], y, padding=1)
    y = nn.batch_norm(p["bn2"], y)
    if "downsample" in p:
        identity = nn.batch_norm(
            p["downsample"]["bn"], nn.conv2d(p["downsample"]["conv"], x, stride=stride)
        )
    return jax.nn.relu(y + identity)


def _bottleneck(p: dict, x, stride: int):
    identity = x
    y = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x)))
    y = jax.nn.relu(nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], y, stride=stride, padding=1)))
    y = nn.batch_norm(p["bn3"], nn.conv2d(p["conv3"], y))
    if "downsample" in p:
        identity = nn.batch_norm(
            p["downsample"]["bn"], nn.conv2d(p["downsample"]["conv"], x, stride=stride)
        )
    return jax.nn.relu(y + identity)


def resnet_trunk_apply(params: dict, x: jax.Array, block: str = "bottleneck") -> jax.Array:
    """Trunk forward: (B, H, W, 3) -> (B, H/32, W/32, C) feature map.

    ``block`` ('basic' | 'bottleneck') is static structure, not a params leaf.
    """
    block_fn = _bottleneck if block == "bottleneck" else _basic
    y = nn.conv2d(params["conv1"], x, stride=2, padding=3)
    y = jax.nn.relu(nn.batch_norm(params["bn1"], y))
    y = lax.reduce_window(
        y, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li in range(1, 5):
        stride = 1 if li == 1 else 2
        for bi, bp in enumerate(params[f"layer{li}"]):
            y = block_fn(bp, y, stride if bi == 0 else 1)
    return y


def resnet_features(params: dict, x: jax.Array, block: str = "bottleneck") -> jax.Array:
    """Trunk + global average pool -> (B, C_final)."""
    return jnp.mean(resnet_trunk_apply(params, x, block), axis=(1, 2))
