"""Hopenet head-pose estimator: ResNet-50 trunk + 3 x 66-bin heads.

Parity: reference lib/evaluation/hopenet/hopenet.py:5-66; angles are recovered
by the caller as softmax-expectation * 3 - 99 degrees
(traverse_attribute_space.py:488-493).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from warpedganspace_tpu.evalzoo import backbones
from warpedganspace_tpu.nn import core as nn


class Hopenet:
    """Callable: NHWC normalized 224x224 batch -> (yaw, pitch, roll) logits (B, 66)."""

    def __init__(self, params: dict):
        self.params = params
        self._apply = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd: dict) -> "Hopenet":
        params = backbones.resnet_trunk_from_state_dict(sd, depth=50)
        for head in ("fc_yaw", "fc_pitch", "fc_roll"):
            params[head] = backbones._lin(sd, head)
        return cls(params)

    def _forward(self, params, x):
        feats = backbones.resnet_features(params, x)
        return (
            nn.linear(params["fc_yaw"], feats),
            nn.linear(params["fc_pitch"], feats),
            nn.linear(params["fc_roll"], feats),
        )

    def __call__(self, x):
        return self._apply(self.params, x)

    @staticmethod
    def angles_deg(logits):
        """softmax-expectation bin decode: degrees (reference :488-493)."""
        probs = jax.nn.softmax(logits, axis=-1)
        idx = jnp.arange(66, dtype=jnp.float32)
        return jnp.sum(probs * idx, axis=-1) * 3.0 - 99.0
