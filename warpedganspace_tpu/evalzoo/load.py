"""Eval-zoo builders: load pretrained torch checkpoints into JAX predictors.

Weight paths follow the reference layout under models/pretrained/
(README.md:62-72); artifacts come from download_models.py.
"""
from __future__ import annotations

import os.path as osp

from warpedganspace_tpu.utils.io import load_pt


def _load(path: str) -> dict:
    if not osp.isfile(path):
        raise FileNotFoundError(
            f"Pretrained weights not found: {path} (run download_models.py)"
        )
    return load_pt(path)


def load_sfd(path: str = "models/pretrained/sfd/s3fd-619a316812.pth"):
    from warpedganspace_tpu.evalzoo.sfd import SFDDetector

    return SFDDetector.from_state_dict(_load(path))


def load_arcface(path: str = "models/pretrained/arcface/model_ir_se50.pth"):
    from warpedganspace_tpu.evalzoo.arcface import IDComparator

    # The raw checkpoint is the bare SE-IR-50 state dict (reference arcface.py:12).
    return IDComparator.from_state_dict(_load(path), prefix="")


def load_fairface(path: str = "models/pretrained/fairface/fairface_alldata_4race_20191111.pt"):
    from warpedganspace_tpu.evalzoo.fairface import FairFace

    return FairFace.from_state_dict(_load(path))


def load_hopenet(path: str = "models/pretrained/hopenet/hopenet_alpha2.pkl"):
    from warpedganspace_tpu.evalzoo.hopenet import Hopenet

    return Hopenet.from_state_dict(_load(path))


def load_audetector(path: str = "models/pretrained/au_detector/disfa_adaptation_f0.pth"):
    from warpedganspace_tpu.evalzoo.fanau import AUdetector

    blob = _load(path)
    sd = blob["state_dict"] if "state_dict" in blob else blob
    return AUdetector.from_state_dict(sd)


def load_celeba(
    attr_file: str | None = None,
    path: str = "models/pretrained/celeba_attributes/eval_predictor.pth.tar",
):
    from warpedganspace_tpu.evalzoo.celeba import celeba_attr_predictor

    if attr_file is None:
        attr_file = osp.join(
            osp.dirname(osp.dirname(osp.abspath(__file__))), "configs", "attributes_5.json"
        )
    blob = _load(path)
    sd = blob["state_dict"] if "state_dict" in blob else blob
    return celeba_attr_predictor(attr_file, sd)
