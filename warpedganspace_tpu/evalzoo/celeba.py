"""CelebA 5-attribute predictor (Talk-to-Edit): ResNet-50 trunk + fc stem +
per-attribute classifier heads.

Parity: reference lib/evaluation/celeba_attributes/celeba_attr_predictor.py
(:88-191). Heads are built from the attr_info json; scores are computed by the
caller as (argmax + max-softmax)/6 (traverse_attribute_space.py:367-371).
Note: the reference loader first downloads ImageNet resnet50 weights via
model_zoo (celeba_attr_predictor.py:189) and then strictly overwrites ALL of
them from the real checkpoint (:190) — the rebuild drops that dead network
access.
"""
from __future__ import annotations

import json

import jax

from warpedganspace_tpu.evalzoo import backbones
from warpedganspace_tpu.nn import core as nn


def _fc_block(sd, prefix):
    return {"fc": backbones._lin(sd, prefix + ".fc"), "bn": backbones._bn(sd, prefix + ".bn")}


def _fc_block_apply(p, x):
    x = nn.linear(p["fc"], x)
    x = nn.batch_norm(p["bn"], x)
    return jax.nn.relu(x)


class CelebaAttrPredictor:
    """Callable: NHWC normalized 224x224 batch -> {attr_name: (B, 6) logits}."""

    def __init__(self, params: dict, attr_info: dict):
        self.params = params
        self.attr_info = attr_info
        self._apply = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd: dict, attr_file: str) -> "CelebaAttrPredictor":
        with open(attr_file) as f:
            attr_info = json.load(f)["attr_info"]
        params = backbones.resnet_trunk_from_state_dict(sd, depth=50)
        params["stem"] = _fc_block(sd, "stem")
        params["heads"] = {}
        for key, val in attr_info.items():
            prefix = "classifier" + str(key).zfill(2) + val["name"]
            params["heads"][val["name"]] = {
                "fc1": _fc_block(sd, prefix + ".0"),
                "fc2": backbones._lin(sd, prefix + ".1"),
            }
        return cls(params, attr_info)

    def _forward(self, params, x):
        feats = backbones.resnet_features(params, x)
        feats = _fc_block_apply(params["stem"], feats)
        out = {}
        for name, head in params["heads"].items():
            h = _fc_block_apply(head["fc1"], feats)
            out[name] = nn.linear(head["fc2"], h)
        return out

    def __call__(self, x):
        return self._apply(self.params, x)


def celeba_attr_predictor(attr_file: str, state_dict: dict) -> CelebaAttrPredictor:
    """Build the predictor from a converted checkpoint state dict
    (the reference loads 'state_dict' from predictor .pth.tar, :189-191)."""
    return CelebaAttrPredictor.from_state_dict(state_dict, attr_file)
