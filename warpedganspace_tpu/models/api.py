"""Uniform generator contract.

The reference wraps every GAN behind the same interface (models/gan_load.py):
``G(z, shift=None) -> image``, attribute ``G.dim_z``, and (StyleGAN2)
``G.get_w(z)``. Here that contract is a frozen dataclass bundling a *pure*
apply function with its frozen parameter pytree:

- ``apply(params, z, shift=None, latent_is_w=False)`` — jit-friendly pure
  function, images returned NHWC in tanh range.
- ``get_w(params, z)`` — identity for Z-space GANs; the mapping network for
  StyleGAN2.
- ``bundle(z, shift)`` — convenience call binding the stored params (CLI use).

Keeping apply/params separate (instead of stateful Modules) is what lets the
training step jit the *whole* iteration — two generator forwards + the backward
through G — into one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


def cast_params_bf16(params):
    """Cast every float32 leaf of a frozen param pytree to bfloat16 (integer
    leaves, e.g. BigGAN class buffers, pass through). The single definition of
    the mixed-precision cast policy — used by the trainer, the train step's
    in-jit (traced-to-identity) re-cast, the traversal CLI and the bench."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )


@dataclasses.dataclass(frozen=True)
class GeneratorBundle:
    """A frozen generator: pure apply + params + metadata."""

    name: str
    dim_z: int
    resolution: int
    out_channels: int
    params: Any
    apply_fn: Callable
    get_w_fn: Callable | None = None
    # StyleGAN2: directions live in W-space when True (models/gan_load.py:145-155).
    shift_in_w_space: bool = False
    # apply accepts out_layout="s2d" (S2D-layout images; the 1024² generators'
    # native tail layout) — lets the train step skip the G->R layout transposes.
    supports_s2d_out: bool = False
    # Layout the no-grad render stream should request from apply: "s2d" when
    # the tail is S2D-native (un-S2D runs after u8 quantization, +7%
    # device-side — traverse/engine.py), "nhwc" when the tail already emits
    # NHWC (e.g. ProgGAN's fused Pallas tail). None = derive from
    # supports_s2d_out.
    render_out_layout: str | None = None

    @property
    def render_layout(self) -> str:
        if self.render_out_layout is not None:
            return self.render_out_layout
        return "s2d" if self.supports_s2d_out else "nhwc"

    @property
    def dim_w(self) -> int:
        return self.dim_z

    def apply(self, params, z, shift=None, **kwargs):
        return self.apply_fn(params, z, shift, **kwargs)

    def get_w(self, params, z):
        if self.get_w_fn is None:
            return z
        return self.get_w_fn(params, z)

    def __call__(self, z, shift=None, **kwargs):
        return self.apply_fn(self.params, z, shift, **kwargs)
