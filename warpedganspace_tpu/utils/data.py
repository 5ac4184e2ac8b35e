"""Path-image loading (parity: reference lib/data.py PathImages).

Loads the sorted JPEG frames of one traversal path as a float array in
[0, 255]. The attribute pipeline deliberately reads the saved (lossy, q75)
JPEGs rather than generator tensors — reproducing ranking outputs requires
matching this round-trip (SURVEY.md hard part #6). Layout here is NHWC.
"""
from __future__ import annotations

import glob
import os.path as osp

import cv2
import numpy as np


class PathImages:
    def __init__(self, root_path: str):
        self.images_files = sorted(glob.glob(osp.join(root_path, "*.jpg")))

    def __len__(self) -> int:
        return len(self.images_files)

    def __getitem__(self, index: int) -> np.ndarray:
        return self.image2array(self.images_files[index])

    @staticmethod
    def image2array(image_file: str) -> np.ndarray:
        img = cv2.imread(image_file, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype("uint8")
        return img.astype(np.float32)  # (H, W, 3) in [0, 255]

    def load_all(self) -> np.ndarray:
        """The whole path as one (T, H, W, 3) batch (the reference uses a
        DataLoader with batch = path length, traverse_attribute_space.py:298-305)."""
        return np.stack([self[i] for i in range(len(self))])
