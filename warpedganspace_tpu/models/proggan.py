"""ProgGAN (Progressive Growing of GANs) 1024x1024 CelebA-HQ generator.

Behavioral parity with reference ``models/ProgGAN/model.py``: a fixed chain of
18 blocks, each PixelNorm -> (optional 2x nearest-up) -> conv3x3 (no bias) ->
WScale (learned scalar scale + per-channel bias) -> LeakyReLU(0.2) (:34-62),
channels 512...16, then an output head PixelNorm -> conv1x1 -> WScale (:65-95).
Input is a (B, 512) latent reshaped to a 1x1 spatial seed; the first block pads
by 3 so the 4x4 conv produces a 4x4 map.

Inference-only (frozen generator); NHWC activations.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.ops import s2d

# (kernel, padding, upsample) for the 18 feature blocks — channels are implied
# by the converted weights (512 x4, then halving to 16; model.py:67-84).
_BLOCK_SPECS = [(4, 3, False), (3, 1, False)] + [(3, 1, up) for up in
                [True, False] * 8]


def _nhwc_block_core(p: dict, x: jax.Array, pad: int, up: bool) -> jax.Array:
    """PixelNorm -> [nearest-up] conv -> WScale in plain NHWC. Up blocks (all
    3x3 pad-1) run as ONE lhs-dilated conv with the merged 4x4 kernel
    (ops/s2d.py::nearest_up_conv_merged_kernel — exact, 2.25x fewer dense
    MACs, no 4x intermediate)."""
    x = nn.pixel_norm(x)
    if up:
        x = s2d.nearest_up_conv_merged_apply(
            x, s2d.nearest_up_conv_merged_kernel(p["conv"]["w"]))
    else:
        x = nn.conv2d(p["conv"], x, padding=pad)
    return x * p["wscale_scale"] + p["wscale_bias"]


@dataclasses.dataclass(frozen=True)
class ProgGANGenerator:
    dim_z: int = 512
    resolution: int = 1024
    image_channels: int = 3
    # Rematerialize blocks during backprop-through-G (1024^2 training memory).
    # True = every block; "tail" = only the <128-channel high-resolution
    # blocks (the memory hogs; low-res activations are cheap to store).
    remat: bool | str = False
    # Layout of the <128-channel high-resolution tail: "s2d" (space-to-depth;
    # removes the TPU lane padding of the 16-64 channel layers — see
    # ops/s2d.py), "nhwc" (plain), or "pallas" (fused section kernel,
    # ops/proggan_tail_pallas.py — the fast inference path on TPU; falls back
    # to "s2d" for out_layout="s2d" and to "nhwc" when the block chain does
    # not match the fused-tail pattern).
    tail_layout: str = "s2d"

    def init(self, key: jax.Array, channels=None) -> dict:
        """Random init (test use; real use converts the pretrained .pth).

        ``channels`` overrides the reference 1024^2 channel chain (length N+1
        for N feature blocks; ``apply`` derives depth — and therefore output
        resolution — from the params tree, so a short chain yields a small
        generator: tests and the multichip dryrun use this). ``channels[0]``
        must equal ``dim_z``."""
        if channels is None:
            channels = [512, 512, 512, 512, 512, 512, 512, 512, 512, 256, 256,
                        128, 128, 64, 64, 32, 32, 16, 16]
        specs = _BLOCK_SPECS[: len(channels) - 1]
        keys = jax.random.split(key, len(specs) + 1)
        blocks = []
        for i, (k, _, _) in enumerate(specs):
            cin, cout = channels[i], channels[i + 1]
            blocks.append(
                {
                    "conv": {"w": jax.random.normal(keys[i], (k, k, cin, cout)) * 0.02},
                    "wscale_scale": jnp.ones((1,)),
                    "wscale_bias": jnp.zeros((cout,)),
                }
            )
        out = {
            "conv": {"w": jax.random.normal(
                keys[-1], (1, 1, channels[-1], self.image_channels)) * 0.02},
            "wscale_scale": jnp.ones((1,)),
            "wscale_bias": jnp.zeros((self.image_channels,)),
        }
        return {"blocks": blocks, "out": out}

    def apply(self, params: dict, z: jax.Array, shift: jax.Array | None = None,
              out_layout: str = "nhwc"):
        """G(z + shift) -> (B, 1024, 1024, 3) images.

        Parity: ProgGANWrapper.forward reshapes z to (B, 512, 1, 1)
        (models/gan_load.py:109-120) and runs the Sequential (model.py:86-95).

        ``out_layout='s2d'`` returns the S2D-layout image (B, 512, 512, 12) —
        free with the S2D tail (skips the final ``from_s2d``); consumed by
        ``Reconstructor.apply_pair_s2d`` in the training step.
        """
        if self.tail_layout not in ("s2d", "nhwc", "pallas"):
            raise ValueError(f"unknown tail_layout {self.tail_layout!r} "
                             "(ProgGAN supports 's2d', 'nhwc' and 'pallas')")
        if out_layout not in ("nhwc", "s2d"):
            raise ValueError(f"unknown out_layout {out_layout!r}")
        if self.remat not in (True, False, "tail"):
            raise ValueError(f"unknown remat policy {self.remat!r}")
        if self.tail_layout == "pallas":
            if out_layout == "s2d":
                # The pair-handoff training path stays on the autodiff-native
                # s2d composition (the kernel is an inference fast path).
                return dataclasses.replace(self, tail_layout="s2d").apply(
                    params, z, shift, out_layout)
            return self._apply_pallas_tail(params, z, shift)
        if shift is not None:
            z = z + shift
        x = z[:, None, None, :]  # (B, 1, 1, 512) — NHWC seed

        def block(p, x, kernel, pad, up, fmt, entry):
            if fmt == "S2D" and not entry:
                x = s2d.pixel_norm_s2d(x)
                if up:
                    x = s2d.s2d_conv(x, s2d.nearest_up_conv_s2d_kernel(p["conv"]["w"]),
                                     dilated=True)
                else:
                    x = s2d.s2d_conv(x, s2d.same_conv_kernel(p["conv"]["w"]),
                                     dilated=False)
                x = x * p["wscale_scale"] + jnp.tile(p["wscale_bias"], 4)
            elif fmt == "S2D":  # entry: NHWC in, S2D out (always an up block)
                x = nn.pixel_norm(x)
                x = s2d.s2d_conv(x, s2d.nearest_up_conv_entry_kernel(p["conv"]["w"]),
                                 dilated=False)
                x = x * p["wscale_scale"] + jnp.tile(p["wscale_bias"], 4)
            else:
                x = _nhwc_block_core(p, x, pad, up)
            return jnp.where(x >= 0, x, 0.2 * x)

        block_ckpt = jax.checkpoint(block, static_argnums=(2, 3, 4, 5, 6))

        fmt = "NHWC"
        for spec, p in zip(_BLOCK_SPECS, params["blocks"]):
            kernel, pad, up = spec
            entry = False
            cout = p["conv"]["w"].shape[3]
            if (
                self.tail_layout == "s2d"
                and fmt == "NHWC"
                and up
                and cout < 128
            ):
                fmt, entry = "S2D", True
            remat_this = (self.remat is True) or (self.remat == "tail" and cout < 128)
            x = (block_ckpt if remat_this else block)(p, x, kernel, pad, up, fmt, entry)
        if fmt == "S2D":
            x = s2d.pixel_norm_s2d(x)
            x = s2d.s2d_conv(x, s2d.diag_1x1_kernel(params["out"]["conv"]["w"]),
                             dilated=False)
            x = x * params["out"]["wscale_scale"] + jnp.tile(
                params["out"]["wscale_bias"], 4)
            return x if out_layout == "s2d" else s2d.from_s2d(x)
        x = nn.pixel_norm(x)
        x = nn.conv2d(params["out"]["conv"], x, padding=0)
        x = x * params["out"]["wscale_scale"] + params["out"]["wscale_bias"]
        return s2d.to_s2d(x) if out_layout == "s2d" else x

    def _apply_pallas_tail(self, params: dict, z: jax.Array,
                           shift: jax.Array | None) -> jax.Array:
        """NHWC head blocks (>=128-channel, lane-dense in plain XLA) + the
        fused Pallas tail sections (ops/proggan_tail_pallas.py). Output is
        NHWC; numerically a bf16-level match of the nhwc composition
        (suite-tested). Falls back to the nhwc path when the block chain does
        not end in the (up 2C->C, same C->C)* + 1x1 head pattern.

        ``remat`` semantics here: True checkpoints the head blocks;
        "tail" is a no-op — the tail IS the fused kernel, whose custom_vjp
        fallback recomputes through the jnp twin anyway (training uses the
        s2d composition, where "tail" has its usual meaning)."""
        from warpedganspace_tpu.ops import proggan_tail_pallas as ptp

        blocks = params["blocks"]
        n_head, sections = ptp.tail_sections_from_blocks(
            blocks, _BLOCK_SPECS[: len(blocks)])
        if not sections:
            return dataclasses.replace(self, tail_layout="nhwc").apply(
                params, z, shift)
        if shift is not None:
            z = z + shift
        x = z[:, None, None, :]

        def block(p, x, kernel, pad, up):
            x = _nhwc_block_core(p, x, pad, up)
            return jnp.where(x >= 0, x, 0.2 * x)

        block_ckpt = jax.checkpoint(block, static_argnums=(2, 3, 4))
        for spec, p in zip(_BLOCK_SPECS[:n_head], blocks[:n_head]):
            kernel, pad, up = spec
            x = (block_ckpt if self.remat is True else block)(
                p, x, kernel, pad, up)
        return ptp.proggan_tail_pallas(x, sections, params["out"])
