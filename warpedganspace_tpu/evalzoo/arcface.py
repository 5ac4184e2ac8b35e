"""ArcFace identity comparator: SE-IR-50 backbone + cosine similarity.

Parity: reference lib/evaluation/archface/arcface.py — fixed face crop
x[:, :, 35:223, 32:220] + adaptive average pool to 112^2 (:16-19), SE-IR
bottleneck stack (:82-130), output BN-dropout-flatten-linear-BN1d + l2-norm
(:141-147, :36-39), cosine similarity of the two embeddings averaged over the
batch (:14, :21-22).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from warpedganspace_tpu.evalzoo.backbones import _bn, _conv_w, _lin
from warpedganspace_tpu.nn import core as nn

# (in_channel, depth, stride) per bottleneck, 50-layer config (reference :114-121).
def _blocks_50():
    spec = []
    for in_ch, depth, units in ((64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)):
        spec.append((in_ch, depth, 2))
        spec.extend((depth, depth, 1) for _ in range(units - 1))
    return spec


def _prelu(x, a):
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def adaptive_avg_pool(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch AdaptiveAvgPool2d semantics on NHWC via an integral image:
    window i spans [floor(i*H/out), ceil((i+1)*H/out))."""
    b, h, w, c = x.shape
    integral = jnp.pad(
        jnp.cumsum(jnp.cumsum(x, axis=1), axis=2), ((0, 0), (1, 0), (1, 0), (0, 0))
    )
    hs = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    he = np.ceil((np.arange(out_h) + 1) * h / out_h).astype(np.int32)
    ws = np.floor(np.arange(out_w) * w / out_w).astype(np.int32)
    we = np.ceil((np.arange(out_w) + 1) * w / out_w).astype(np.int32)
    area = (he - hs)[:, None] * (we - ws)[None, :]  # (out_h, out_w)

    top_l = integral[:, hs][:, :, ws]
    top_r = integral[:, hs][:, :, we]
    bot_l = integral[:, he][:, :, ws]
    bot_r = integral[:, he][:, :, we]
    summed = bot_r - bot_l - top_r + top_l
    return summed / jnp.asarray(area, dtype=x.dtype)[None, :, :, None]


def _se(p: dict, x):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(nn.conv2d(p["fc1"], s))
    s = jax.nn.sigmoid(nn.conv2d(p["fc2"], s))
    return x * s


def _bottleneck_ir_se(p: dict, x, stride: int):
    if "shortcut_conv" in p:
        shortcut = nn.batch_norm(p["shortcut_bn"], nn.conv2d(p["shortcut_conv"], x, stride=stride))
    else:
        # MaxPool2d(1, stride): plain subsampling.
        shortcut = x[:, ::stride, ::stride, :]
    y = nn.batch_norm(p["res_bn1"], x)
    y = nn.conv2d(p["res_conv1"], y, padding=1)
    y = _prelu(y, p["res_prelu"])
    y = nn.conv2d(p["res_conv2"], y, stride=stride, padding=1)
    y = nn.batch_norm(p["res_bn2"], y)
    y = _se(p["se"], y)
    return y + shortcut


def se_ir50_from_state_dict(sd: dict, prefix: str = "backbone.") -> dict:
    params = {
        "input_conv": {"w": _conv_w(sd[prefix + "input_layer.0.weight"])},
        "input_bn": _bn(sd, prefix + "input_layer.1"),
        "input_prelu": jnp.asarray(np.asarray(sd[prefix + "input_layer.2.weight"], dtype=np.float32)),
        "blocks": [],
        "out_bn2d": _bn(sd, prefix + "output_layer.0"),
        "out_linear": _lin(sd, prefix + "output_layer.3"),
        "out_bn1d": _bn(sd, prefix + "output_layer.4"),
    }
    for i, (in_ch, depth, stride) in enumerate(_blocks_50()):
        p = f"{prefix}body.{i}."
        bp = {
            "res_bn1": _bn(sd, p + "res_layer.0"),
            "res_conv1": {"w": _conv_w(sd[p + "res_layer.1.weight"])},
            "res_prelu": jnp.asarray(np.asarray(sd[p + "res_layer.2.weight"], dtype=np.float32)),
            "res_conv2": {"w": _conv_w(sd[p + "res_layer.3.weight"])},
            "res_bn2": _bn(sd, p + "res_layer.4"),
            "se": {
                "fc1": {"w": _conv_w(sd[p + "res_layer.5.fc1.weight"])},
                "fc2": {"w": _conv_w(sd[p + "res_layer.5.fc2.weight"])},
            },
        }
        if in_ch != depth:
            bp["shortcut_conv"] = {"w": _conv_w(sd[p + "shortcut_layer.0.weight"])}
            bp["shortcut_bn"] = _bn(sd, p + "shortcut_layer.1")
        params["blocks"].append(bp)
    return params


def se_ir50_apply(params: dict, x: jax.Array) -> jax.Array:
    """(B, 112, 112, 3) -> l2-normalized 512-d embeddings."""
    y = nn.conv2d(params["input_conv"], x, padding=1)
    y = nn.batch_norm(params["input_bn"], y)
    y = _prelu(y, params["input_prelu"])
    # Strides are static structure from the 50-layer block spec, NOT params
    # leaves (an int leaf would be traced under jit).
    for bp, (_, _, stride) in zip(params["blocks"], _blocks_50()):
        y = _bottleneck_ir_se(bp, y, stride)
    y = nn.batch_norm(params["out_bn2d"], y)
    # Dropout is identity at eval. Flatten in torch C-order: (B, C, 7, 7).
    y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)
    y = nn.linear(params["out_linear"], y)
    y = nn.batch_norm(params["out_bn1d"], y)
    return y / jnp.linalg.norm(y, axis=1, keepdims=True)


class IDComparator:
    """Cosine identity similarity of an image pair (reference :8-22).

    Inputs NHWC in [-1, 1] at 256x256 (as produced by the attribute pipeline).
    """

    def __init__(self, params: dict):
        self.params = params
        self._apply = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd: dict, prefix: str = "backbone.") -> "IDComparator":
        return cls(se_ir50_from_state_dict(sd, prefix))

    @staticmethod
    def _extract(params, x):
        x = x[:, 35:223, 32:220, :]  # fixed crop (reference :16-18), NHWC
        x = adaptive_avg_pool(x, 112, 112)
        return se_ir50_apply(params, x)

    def _forward(self, params, x, x_prime):
        return jnp.mean(self._sims(params, x, x_prime))

    @staticmethod
    def _sims(params, x, x_prime):
        e1 = IDComparator._extract(params, x)
        e2 = IDComparator._extract(params, x_prime)
        return jnp.sum(e1 * e2, axis=1) / (
            jnp.linalg.norm(e1, axis=1) * jnp.linalg.norm(e2, axis=1) + 1e-6
        )

    def __call__(self, x, x_prime):
        return self._apply(self.params, x, x_prime)

    def similarities(self, x, x_prime):
        """Per-pair cosine similarities (batched variant of the reference's
        one-pair-at-a-time loop, traverse_attribute_space.py:395-415)."""
        if not hasattr(self, "_apply_sims"):
            self._apply_sims = jax.jit(self._sims)
        return self._apply_sims(self.params, x, x_prime)
