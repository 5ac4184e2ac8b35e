"""Attribute-evaluation model zoo (inference-only predictors).

Parity surface (reference lib/evaluation/ + traverse_attribute_space.py):
SFDDetector (S3FD face detection), IDComparator (ArcFace SE-IR-50 cosine
similarity), FairFace (resnet34, race/gender/age), Hopenet (yaw/pitch/roll),
AUdetector (FAN-AU, 12 action-unit intensities), celeba_attr_predictor
(ResNet-50 + per-attribute heads).

All networks are pure JAX functions over converted-parameter pytrees; the
data-dependent post-processing (anchor decode, NMS, per-frame face crops) stays
host-side numpy as in the reference (SURVEY.md hard-part #5).
"""

from warpedganspace_tpu.evalzoo.sfd import SFDDetector
from warpedganspace_tpu.evalzoo.arcface import IDComparator
from warpedganspace_tpu.evalzoo.hopenet import Hopenet
from warpedganspace_tpu.evalzoo.fairface import FairFace
from warpedganspace_tpu.evalzoo.fanau import AUdetector
from warpedganspace_tpu.evalzoo.celeba import celeba_attr_predictor

__all__ = [
    "SFDDetector",
    "IDComparator",
    "Hopenet",
    "FairFace",
    "AUdetector",
    "celeba_attr_predictor",
]
