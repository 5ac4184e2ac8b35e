"""FAN-AU action-unit detector: stacked-hourglass QFAN (68-point FAN) feeding a
lightweight hourglass FANAU head producing 12 AU heatmaps.

Parity: reference lib/evaluation/au_detector/hourglass.py (ConvBlock with
ReLU6 and channel-concat residual :17-66, recursive HourGlass :69-113,
QFAN :116-180, FANAU :216-243) and AU_detector.py (min-max input
normalization over the whole batch :36, intensity = global max of each 64x64
heatmap :43-46).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from warpedganspace_tpu.evalzoo.backbones import _bn, _conv_w
from warpedganspace_tpu.nn import core as nn


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


# ------------------------------------------------------------------ ConvBlock


def _convblock_from_sd(sd, prefix):
    p = {
        "conv1": {"w": _conv_w(sd[prefix + ".conv1.weight"])},
        "bn1": _bn(sd, prefix + ".bn1"),
        "conv2": {"w": _conv_w(sd[prefix + ".conv2.weight"])},
        "bn2": _bn(sd, prefix + ".bn2"),
        "conv3": {"w": _conv_w(sd[prefix + ".conv3.weight"])},
        "bn3": _bn(sd, prefix + ".bn3"),
    }
    if prefix + ".downsample.0.weight" in sd:
        p["downsample"] = {
            "conv": {"w": _conv_w(sd[prefix + ".downsample.0.weight"])},
            "bn": _bn(sd, prefix + ".downsample.1"),
        }
    return p


def _convblock_apply(p, x):
    k = p["conv1"]["w"].shape[0]  # 3 (standard) or 1 (lightweight)
    pad = 1 if k == 3 else 0
    out1 = _relu6(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x, padding=pad)))
    out2 = _relu6(nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], out1, padding=pad)))
    out3 = _relu6(nn.batch_norm(p["bn3"], nn.conv2d(p["conv3"], out2, padding=pad)))
    out = jnp.concatenate([out1, out2, out3], axis=-1)
    residual = x
    if "downsample" in p:
        residual = _relu6(nn.batch_norm(p["downsample"]["bn"], nn.conv2d(p["downsample"]["conv"], x)))
    return out + residual


# ------------------------------------------------------------------ HourGlass


def _hourglass_from_sd(sd, prefix, depth=4):
    # depth (4 everywhere) is static structure, not a params leaf.
    p = {}
    for level in range(1, depth + 1):
        p[f"b1_{level}"] = _convblock_from_sd(sd, f"{prefix}.b1_{level}")
        p[f"b2_{level}"] = _convblock_from_sd(sd, f"{prefix}.b2_{level}")
        p[f"b3_{level}"] = _convblock_from_sd(sd, f"{prefix}.b3_{level}")
    p["b2_plus_1"] = _convblock_from_sd(sd, f"{prefix}.b2_plus_1")
    return p


def _hourglass_apply(p, x, level=4):
    up1 = _convblock_apply(p[f"b1_{level}"], x)
    low1 = nn.max_pool(x, 2, 2)
    low1 = _convblock_apply(p[f"b2_{level}"], low1)
    if level > 1:
        low2 = _hourglass_apply(p, low1, level - 1)
    else:
        low2 = _convblock_apply(p["b2_plus_1"], low1)
    low3 = _convblock_apply(p[f"b3_{level}"], low2)
    up2 = nn.upsample_nearest(low3, 2)
    return up1 + up2


# ----------------------------------------------------------------------- QFAN


def _seq_conv_bn(sd, prefix):
    return {
        "conv": {
            "w": _conv_w(sd[prefix + ".0.weight"]),
            "b": jnp.asarray(np.asarray(sd[prefix + ".0.bias"], dtype=np.float32)),
        },
        "bn": _bn(sd, prefix + ".1"),
    }


def fanau_params_from_state_dict(sd: dict) -> dict:
    params = {
        "fan": {
            "conv1": {
                "w": _conv_w(sd["fan.conv1.weight"]),
                "b": jnp.asarray(np.asarray(sd["fan.conv1.bias"], dtype=np.float32)),
            },
            "bn1": _bn(sd, "fan.bn1"),
            "conv2": _convblock_from_sd(sd, "fan.conv2"),
            "conv3": _convblock_from_sd(sd, "fan.conv3"),
            "conv4": _convblock_from_sd(sd, "fan.conv4"),
            "m0": _hourglass_from_sd(sd, "fan.m0"),
            "top_m_0": _convblock_from_sd(sd, "fan.top_m_0"),
            "conv_last0": {
                "w": _conv_w(sd["fan.conv_last0.weight"]),
                "b": jnp.asarray(np.asarray(sd["fan.conv_last0.bias"], dtype=np.float32)),
            },
            "bn_end0": _bn(sd, "fan.bn_end0"),
            "l0": {
                "w": _conv_w(sd["fan.l0.weight"]),
                "b": jnp.asarray(np.asarray(sd["fan.l0.bias"], dtype=np.float32)),
            },
        },
        "conv1": _seq_conv_bn(sd, "conv1"),
        "conv2": _seq_conv_bn(sd, "conv2"),
        "net": _hourglass_from_sd(sd, "net"),
        "conv_last": _seq_conv_bn(sd, "conv_last"),
        "l": {
            "w": _conv_w(sd["l.weight"]),
            "b": jnp.asarray(np.asarray(sd["l.bias"], dtype=np.float32)),
        },
    }
    return params


def _qfan_apply(p, x):
    x = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x, stride=2, padding=3)))
    x = nn.max_pool(_convblock_apply(p["conv2"], x), 2, 2)
    x = _convblock_apply(p["conv3"], x)
    x = _convblock_apply(p["conv4"], x)
    features = x
    hg = _hourglass_apply(p["m0"], x)
    ll = _convblock_apply(p["top_m_0"], hg)
    ll = jax.nn.relu(nn.batch_norm(p["bn_end0"], nn.conv2d(p["conv_last0"], ll)))
    heatmaps = nn.conv2d(p["l0"], ll)  # 68-channel landmarks
    return heatmaps, features


def fanau_apply(params: dict, x: jax.Array) -> jax.Array:
    """(B, 256, 256, 3) normalized input -> (B, 64, 64, 12) AU heatmaps."""
    out, features = _qfan_apply(params["fan"], x)

    def seq(p, v):
        return _relu6(nn.batch_norm(p["bn"], nn.conv2d(p["conv"], v)))

    h = seq(params["conv1"], out) + seq(params["conv2"], features)
    h = _hourglass_apply(params["net"], h)
    h = seq(params["conv_last"], h)
    return nn.conv2d(params["l"], h)


class AUdetector:
    """Reference-compatible API (AU_detector.py:30-46)."""

    def __init__(self, params: dict):
        self.params = params
        self.naus = 12
        self._apply = jax.jit(fanau_apply)

    @classmethod
    def from_state_dict(cls, sd: dict) -> "AUdetector":
        return cls(fanau_params_from_state_dict(sd))

    def detect_AU(self, img_nhwc) -> jnp.ndarray:
        """(B, 256, 256, 3) raw images -> (B, 12) AU intensities.

        Min-max normalization is over the WHOLE batch tensor and intensity is
        the global max of each heatmap, as in the reference (:36, :43-46).
        """
        img = jnp.asarray(img_nhwc, dtype=jnp.float32)
        img = (img - img.min()) / (img.max() - img.min())
        if img.ndim == 3:
            img = img[None]
        heatmaps = self._apply(self.params, img)
        return jnp.max(heatmaps, axis=(1, 2))
