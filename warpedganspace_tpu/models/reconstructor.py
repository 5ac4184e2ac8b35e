"""Reconstructor R: predicts (path index, shift magnitude) from an image pair.

Behavioral parity with reference ``lib/reconstructor.py``:

- ``LeNet`` variant (:18-49): width-2 LeNet over the channel-concatenated pair —
  3 x [conv5x5 -> BN -> ReLU (-> maxpool2)] then spatial mean, and two
  linear->BN->ReLU->linear heads (path logits of size K; scalar magnitude).
  Used for 32/64 px GANs.
- ``ResNet`` variant (:52-69): torchvision-style ResNet-18 with conv1 rebuilt
  for 6 input channels (kaiming-normal initialized), features taken at the
  global average pool, plus two linear heads.

Everything is a pure function over a params pytree; BatchNorm running stats are
leaves of the same pytree and are refreshed by the train-mode apply (see
``batch_norm``). Images are NHWC.

Mixed precision (``apply(..., dtype=jnp.bfloat16)``): convolutions run in bf16
(inputs and weights cast at use — the master params stay float32, so optimizer
updates and checkpoints are full precision), BatchNorm statistics and the two
linear heads stay float32. R at the 1024^2 config is bandwidth-bound (64-ch
maps at 512^2 pad the 128-wide lanes), so halving activation width is a
measured ~1.6x on the fwd+bwd (110 -> 70 ms at bs12 on v5e).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.ops import s2d as s2dops


def _cast(p: dict, dtype) -> dict:
    """Cast conv/linear weights at use; BN param dicts pass through float32."""
    if dtype is None or "mean" in p:
        return p
    return {k: (v.astype(dtype) if k in ("w", "b") else v) for k, v in p.items()}


# ------------------------------------------------------------------ResNet-18 bits


def _basic_block_init(key, in_ch: int, out_ch: int, stride: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": {"w": nn.kaiming_normal(k1, (3, 3, in_ch, out_ch))},
        "bn1": nn.batch_norm_init(out_ch),
        "conv2": {"w": nn.kaiming_normal(k2, (3, 3, out_ch, out_ch))},
        "bn2": nn.batch_norm_init(out_ch),
    }
    if stride != 1 or in_ch != out_ch:
        p["downsample"] = {
            "conv": {"w": nn.kaiming_normal(k3, (1, 1, in_ch, out_ch))},
            "bn": nn.batch_norm_init(out_ch),
        }
    return p


def _basic_block_apply(p: dict, x, stride: int, train: bool, dtype=None):
    out_p = dict(p)
    identity = x
    y = nn.conv2d(_cast(p["conv1"], dtype), x, stride=stride, padding=1)
    y = _bn(p, out_p, "bn1", y, train)
    y = jax.nn.relu(y)
    y = nn.conv2d(_cast(p["conv2"], dtype), y, stride=1, padding=1)
    y = _bn(p, out_p, "bn2", y, train)
    if "downsample" in p:
        identity = nn.conv2d(_cast(p["downsample"]["conv"], dtype), x, stride=stride, padding=0)
        ds = dict(p["downsample"])
        if train:
            identity, ds["bn"] = nn.batch_norm(p["downsample"]["bn"], identity, train=True)
        else:
            identity = nn.batch_norm(p["downsample"]["bn"], identity, train=False)
        out_p["downsample"] = ds
    return jax.nn.relu(y + identity), out_p


def _bn(p_in: dict, p_out: dict, name: str, x, train: bool):
    if train:
        y, p_out[name] = nn.batch_norm(p_in[name], x, train=True)
        return y
    return nn.batch_norm(p_in[name], x, train=False)


_RESNET18_LAYERS = ((64, 1), (128, 2), (256, 2), (512, 2))  # (channels, first stride)


@dataclasses.dataclass(frozen=True)
class Reconstructor:
    """Static config: variant ('LeNet' | 'ResNet'), K (dim), image channels."""

    reconstructor_type: str
    dim: int
    channels: int = 3
    lenet_width: int = 2

    # ------------------------------------------------------------------- init
    def init(self, key: jax.Array) -> dict:
        if self.reconstructor_type == "LeNet":
            return self._init_lenet(key)
        if self.reconstructor_type == "ResNet":
            return self._init_resnet(key)
        raise ValueError(f"unknown reconstructor type {self.reconstructor_type!r}")

    def _init_lenet(self, key) -> dict:
        w = self.lenet_width
        keys = jax.random.split(key, 8)
        c_in = 2 * self.channels
        return {
            "conv1": nn.conv2d_init(keys[0], c_in, 3 * w, 5),
            "bn1": nn.batch_norm_init(3 * w),
            "conv2": nn.conv2d_init(keys[1], 3 * w, 8 * w, 5),
            "bn2": nn.batch_norm_init(8 * w),
            "conv3": nn.conv2d_init(keys[2], 8 * w, 60 * w, 5),
            "bn3": nn.batch_norm_init(60 * w),
            "cls_fc1": nn.linear_init(keys[3], 60 * w, 42 * w),
            "cls_bn": nn.batch_norm_init(42 * w),
            "cls_fc2": nn.linear_init(keys[4], 42 * w, self.dim),
            "reg_fc1": nn.linear_init(keys[5], 60 * w, 42 * w),
            "reg_bn": nn.batch_norm_init(42 * w),
            "reg_fc2": nn.linear_init(keys[6], 42 * w, 1),
        }

    def _init_resnet(self, key) -> dict:
        keys = jax.random.split(key, 16)
        # Reference rebuilds conv1 for 6 channels with kaiming-normal fan_out
        # (lib/reconstructor.py:56-62).
        p = {
            "conv1": {"w": nn.kaiming_normal(keys[0], (7, 7, 2 * self.channels, 64))},
            "bn1": nn.batch_norm_init(64),
        }
        in_ch = 64
        ki = 1
        for li, (ch, stride) in enumerate(_RESNET18_LAYERS, start=1):
            blocks = []
            for bi in range(2):
                s = stride if bi == 0 else 1
                blocks.append(_basic_block_init(keys[ki], in_ch, ch, s))
                in_ch = ch
                ki += 1
            p[f"layer{li}"] = blocks
        p["cls_fc"] = nn.linear_init(keys[ki], 512, self.dim)
        p["reg_fc"] = nn.linear_init(keys[ki + 1], 512, 1)
        return p

    # ------------------------------------------------------------------ apply
    def apply(self, params: dict, x1: jax.Array, x2: jax.Array, train: bool = False,
              dtype=None):
        """Forward over the channel-concatenated pair.

        Args:
            x1, x2: (B, H, W, C) image pair (original / shifted).
            train:  use batch statistics and refresh running stats.
            dtype:  optional low-precision compute dtype (e.g. jnp.bfloat16)
                    for the conv trunk; heads, BN stats, outputs and the
                    params pytree stay float32.

        Returns:
            eval:  (logits (B, K), magnitudes (B,))
            train: (logits, magnitudes, new_params) with refreshed BN stats.
        """
        x = jnp.concatenate([x1, x2], axis=-1)
        if dtype is not None:
            x = x.astype(dtype)
        if self.reconstructor_type == "LeNet":
            return self._apply_lenet(params, x, train, dtype)
        return self._apply_resnet(params, x, train, dtype)

    def _apply_lenet(self, p: dict, x, train: bool, dtype=None):
        out_p = dict(p)
        y = nn.conv2d(_cast(p["conv1"], dtype), x, padding=0)
        y = jax.nn.relu(_bn(p, out_p, "bn1", y, train))
        y = nn.max_pool(y, 2, 2)
        y = nn.conv2d(_cast(p["conv2"], dtype), y, padding=0)
        y = jax.nn.relu(_bn(p, out_p, "bn2", y, train))
        y = nn.max_pool(y, 2, 2)
        y = nn.conv2d(_cast(p["conv3"], dtype), y, padding=0)
        y = jax.nn.relu(_bn(p, out_p, "bn3", y, train))
        # (B, 60w) spatial mean (reference :73-74); heads stay float32.
        feats = nn.avg_pool_global(y, dtype=jnp.float32)

        h = nn.linear(p["cls_fc1"], feats)
        h = jax.nn.relu(_bn(p, out_p, "cls_bn", h, train))
        logits = nn.linear(p["cls_fc2"], h)

        g = nn.linear(p["reg_fc1"], feats)
        g = jax.nn.relu(_bn(p, out_p, "reg_bn", g, train))
        mags = nn.linear(p["reg_fc2"], g)[:, 0]

        if train:
            return logits, mags, out_p
        return logits, mags

    def apply_pair_s2d(self, params: dict, x1: jax.Array, x2: jax.Array,
                       train: bool = False, dtype=None):
        """ResNet apply taking the image pair in S2D layout (B, H/2, W/2, 4C)
        — the 1024² generator tails' native layout (``to_s2d`` channel order).

        Skips both layout conversions at the G->R boundary of the train step:
        the generator's final ``from_s2d`` and the stem's implicit re-tiling
        (both are ~8 ms transposes at bs12 1024² bf16 — 20x off the copy
        roofline, the minor dim is 3-12 elements). conv1 is re-derived as an
        exact 4x4 stride-1 conv on the S2D grid with a lane-dense contraction
        (ops/s2d.py::stem_conv_s2d_pair_kernel); everything from bn1 on is the
        standard trunk. Same params pytree; bit-exact modulo float reassoc.
        """
        assert self.reconstructor_type == "ResNet", "S2D pair input is ResNet-only"
        p = params
        x = jnp.concatenate([x1, x2], axis=-1)
        if dtype is not None:
            x = x.astype(dtype)
        out_p = dict(p)
        k1 = s2dops.stem_conv_s2d_pair_kernel(_cast(p["conv1"], dtype)["w"],
                                              num_images=2)
        y = s2dops.s2d_conv(x, k1, dilated=False)
        return self._resnet_tail(p, out_p, y, train, dtype)

    def _apply_resnet(self, p: dict, x, train: bool, dtype=None):
        out_p = dict(p)
        y = nn.conv2d(_cast(p["conv1"], dtype), x, stride=2, padding=3)
        return self._resnet_tail(p, out_p, y, train, dtype)

    def _resnet_tail(self, p: dict, out_p: dict, y, train: bool, dtype=None):
        """bn1 -> maxpool -> layer1..4 -> pooled heads (shared by both stems)."""
        y = jax.nn.relu(_bn(p, out_p, "bn1", y, train))
        y = lax.reduce_window(
            y,
            y.dtype.type(-jnp.inf),
            lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        for li, (_, stride) in enumerate(_RESNET18_LAYERS, start=1):
            blocks = p[f"layer{li}"]
            new_blocks = []
            for bi, bp in enumerate(blocks):
                s = stride if bi == 0 else 1
                y, nbp = _basic_block_apply(bp, y, s, train, dtype)
                new_blocks.append(nbp)
            out_p[f"layer{li}"] = new_blocks
        # (B, 512); heads stay float32.
        feats = nn.avg_pool_global(y, dtype=jnp.float32)
        logits = nn.linear(p["cls_fc"], feats)
        mags = nn.linear(p["reg_fc"], feats)[:, 0]
        if train:
            return logits, mags, out_p
        return logits, mags
