"""Host-side image transforms for the attribute pipeline.

Parity: the torchvision transform stacks used by traverse_attribute_space.py —
Resize (bilinear, half-pixel centers) + CenterCrop (:172, :203-206, :213) +
ImageNet mean/std Normalize — and the ``crop_face`` helper with its fixed
margins and its transposed x/y indexing quirk (:37-58, applied to NCHW dims
2/3 with x first — preserved here on NHWC dims 1/2).
"""
from __future__ import annotations

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def resize_shorter(img_hwc: np.ndarray, size: int) -> np.ndarray:
    """torchvision Resize semantics: scale the shorter side to ``size``
    (bilinear, half-pixel — cv2 INTER_LINEAR matches). The long side is
    TRUNCATED, ``int(size * long / short)``, exactly as torchvision's
    functional.resize computes it (round() would disagree by 1px on ~half of
    non-square crops and shift every downstream center crop)."""
    h, w = img_hwc.shape[:2]
    if h <= w:
        nh, nw = size, max(1, int(w * size / h))
    else:
        nh, nw = max(1, int(h * size / w)), size
    if (nh, nw) == (h, w):
        return img_hwc
    return cv2.resize(img_hwc, (nw, nh), interpolation=cv2.INTER_LINEAR)


def center_crop(img_hwc: np.ndarray, size: int) -> np.ndarray:
    h, w = img_hwc.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    if top < 0 or left < 0:
        pad_h = max(size - h, 0)
        pad_w = max(size - w, 0)
        img_hwc = np.pad(
            img_hwc,
            ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
        )
        h, w = img_hwc.shape[:2]
        top = int(round((h - size) / 2.0))
        left = int(round((w - size) / 2.0))
    return img_hwc[top : top + size, left : left + size]


def resize_center(batch_nhwc: np.ndarray, size: int) -> np.ndarray:
    """Resize(size) + CenterCrop(size) over a batch."""
    return np.stack([center_crop(resize_shorter(im, size), size) for im in batch_nhwc])


def normalize_imagenet(batch_nhwc: np.ndarray) -> np.ndarray:
    return (batch_nhwc - IMAGENET_MEAN) / IMAGENET_STD


def crop_rect(bbox, src_h: int, src_w: int, padding: float = 0.0):
    """The reference's crop_face rectangle (traverse_attribute_space.py:37-58)
    with its fixed -50/+50/+30 margins and its transposed x/y indexing quirk
    (x slices the height axis, y the width axis; the reference clamps x to
    dim 2 and y to dim 3 of NCHW == H and W). Returns (x0, x1, y0, y1)."""
    x_min = int((1.0 - padding) * bbox[0]) - 50
    y_min = int((1.0 - padding) * bbox[1]) - 50
    x_max = int((1.0 + padding) * bbox[2]) + 50
    y_max = int((1.0 + padding) * bbox[3]) + 30
    x0 = max(x_min, 0)
    y0 = max(y_min, 0)
    x1 = min(src_h, x_max)
    y1 = min(src_w, y_max)
    return x0, x1, y0, y1


def crop_face(images_nhwc: np.ndarray, idx: int, bbox, padding: float = 0.0) -> np.ndarray:
    """Crop one face (host slicing form of :func:`crop_rect`)."""
    x0, x1, y0, y1 = crop_rect(bbox, images_nhwc.shape[1], images_nhwc.shape[2],
                               padding)
    return images_nhwc[idx, x0:x1, y0:y1, :]
