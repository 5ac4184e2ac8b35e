"""Device-side fused crop + resize for the attribute pipeline.

The reference's attribute stage crops each detected face on the host and
resizes it with cv2 before shipping a float32 batch to the accelerator per
predictor (traverse_attribute_space.py:423-531 via crop_face, :37-58). On TPU
that is exactly backwards: the 256^2 frame batch is already on device for the
SFD pass, so the crops should be *gathered* there — the face rectangles are
the only host-side product (they come out of the data-dependent NMS). This
module turns (rect, out_size) into per-frame bilinear sampling plans (host,
tiny: 2 index rows + 1 weight row per axis per frame) and applies them on
device as two batched axis gathers, replicating the host chain
``crop_face -> resize_shorter -> center_crop`` (evalzoo/transforms.py) with
cv2 INTER_LINEAR half-pixel coordinates and clamped borders.

Per-path transfer drops from three float32 crop batches (~80 MB at T=41) to
~200 KB of plans, and the host no longer runs 3xT cv2 resizes per path.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _resized_dims(ch: int, cw: int, size: int):
    """torchvision Resize(size) output dims (transforms.resize_shorter)."""
    if ch <= cw:
        return size, max(1, int(cw * size / ch))
    return max(1, int(ch * size / cw)), size


def _axis_plan(lo: int, n: int, resized_n: int, out_size: int):
    """Sampling plan along one axis: absolute source indices (i0, i1) and the
    bilinear fraction for each of ``out_size`` output pixels, replicating
    cv2 INTER_LINEAR (half-pixel centers, replicate borders) of the crop
    [lo, lo+n) resized to ``resized_n`` then center-cropped to ``out_size``
    at offset round((resized_n - out_size)/2) (transforms.center_crop)."""
    offset = int(round((resized_n - out_size) / 2.0))
    j = np.arange(out_size, dtype=np.float64) + offset
    src = (j + 0.5) * (n / resized_n) - 0.5
    src = np.clip(src, 0.0, n - 1.0)
    i0 = np.floor(src).astype(np.int32)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (src - i0).astype(np.float32)
    return lo + i0, lo + i1, frac


def plan_crop_resize(rects, out_size: int):
    """Stack per-frame axis plans for a batch of rectangles.

    Returns a dict of arrays shaped (T, out_size): h0/h1/hw (height gather
    indices + weight) and w0/w1/ww (width)."""
    plans = {k: [] for k in ("h0", "h1", "hw", "w0", "w1", "ww")}
    for x0, x1, y0, y1 in rects:
        ch, cw = max(x1 - x0, 1), max(y1 - y0, 1)
        nh, nw = _resized_dims(ch, cw, out_size)
        i0, i1, f = _axis_plan(x0, ch, nh, out_size)
        plans["h0"].append(i0)
        plans["h1"].append(i1)
        plans["hw"].append(f)
        i0, i1, f = _axis_plan(y0, cw, nw, out_size)
        plans["w0"].append(i0)
        plans["w1"].append(i1)
        plans["ww"].append(f)
    return {k: np.stack(v) for k, v in plans.items()}


@functools.partial(jax.jit, static_argnums=())
def _apply_plans(frames, h0, h1, hw, w0, w1, ww):
    def one(img, h0, h1, hw, w0, w1, ww):
        rows = img[h0] * (1.0 - hw)[:, None, None] + img[h1] * hw[:, None, None]
        return (rows[:, w0] * (1.0 - ww)[None, :, None]
                + rows[:, w1] * ww[None, :, None])

    return jax.vmap(one)(frames, h0, h1, hw, w0, w1, ww)


def crop_resize(frames_dev: jax.Array, plan: dict) -> jax.Array:
    """(T, H, W, 3) device frames + a ``plan_crop_resize`` plan ->
    (T, S, S, 3) device crops (same value scale as the input)."""
    return _apply_plans(frames_dev, plan["h0"], plan["h1"], plan["hw"],
                        plan["w0"], plan["w1"], plan["ww"])
