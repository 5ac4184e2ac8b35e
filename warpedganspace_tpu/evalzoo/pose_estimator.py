"""Standalone head-pose estimation helper (SFD detect -> Hopenet angles).

Parity: reference lib/evaluation/hopenet/pose_estimator.py — a convenience
wrapper not used by the main pipeline, kept for API completeness. Applies the
same fixed crop margins (-50/+50/+30) with the reference's transposed x/y
indexing quirk (pose_estimator.py:55-77), then Resize(224) + CenterCrop +
ImageNet normalization and the 66-bin Hopenet heads.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from warpedganspace_tpu.evalzoo import load as zoo
from warpedganspace_tpu.evalzoo.hopenet import Hopenet
from warpedganspace_tpu.evalzoo.transforms import crop_face, normalize_imagenet, resize_center


class PoseEstimator:
    def __init__(self, sfd=None, hopenet=None):
        self.face_detector = sfd if sfd is not None else zoo.load_sfd()
        self.model_hopenet = hopenet if hopenet is not None else zoo.load_hopenet()

    def calculate_pose(self, face, batch_index: int, images_nhwc: np.ndarray):
        """Crop one detected face and predict (yaw, pitch, roll) logits."""
        crop = crop_face(images_nhwc, batch_index, face[:4]) / 255.0
        crop = normalize_imagenet(resize_center(crop[None], 224))
        return self.model_hopenet(jnp.asarray(crop))

    def detect_pose_batch(self, images_nhwc: np.ndarray):
        """(B, H, W, 3) images in [0, 255] -> (yaw, pitch, roll) in degrees (B,)."""
        detected_faces, _, _ = self.face_detector.detect_from_batch(images_nhwc)
        yaws, pitches, rolls = [], [], []
        for i, faces in enumerate(detected_faces):
            face = faces[0][:4] if len(faces) > 0 else [0, 0, images_nhwc.shape[2], images_nhwc.shape[1]]
            y, p, r = self.calculate_pose(np.asarray(face, dtype=float), i, images_nhwc)
            yaws.append(float(Hopenet.angles_deg(y)[0]))
            pitches.append(float(Hopenet.angles_deg(p)[0]))
            rolls.append(float(Hopenet.angles_deg(r)[0]))
        return np.asarray(yaws), np.asarray(pitches), np.asarray(rolls)
