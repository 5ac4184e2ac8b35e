"""FairFace predictor: torchvision resnet34 with an 18-way fc head.

Parity: reference traverse_attribute_space.py:179-184 (stock resnet34, fc
rebuilt to 18 outputs) with output slicing race [0:7], gender [7:9], age [9:18]
(:437-467).
"""
from __future__ import annotations

import jax

from warpedganspace_tpu.evalzoo import backbones
from warpedganspace_tpu.nn import core as nn


class FairFace:
    """Callable predictor over an NHWC normalized 224x224 batch."""

    def __init__(self, params: dict):
        self.params = params
        self._apply = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd: dict) -> "FairFace":
        params = backbones.resnet_trunk_from_state_dict(sd, depth=34)
        params["fc"] = backbones._lin(sd, "fc")
        return cls(params)

    def _forward(self, params, x):
        feats = backbones.resnet_features(params, x, block="basic")
        return nn.linear(params["fc"], feats)  # (B, 18)

    def __call__(self, x):
        return self._apply(self.params, x)
