"""Generator builders: load a frozen pretrained GAN behind the uniform contract.

Parity target: reference ``models/gan_load.py`` — ``build_sngan`` (:31-58),
``build_proggan`` (:109-129), ``build_stylegan2`` (:145-188), ``build_biggan``
(:64-101), each returning a wrapper with ``G(z, shift) -> image``, ``G.dim_z``
and (StyleGAN2) ``G.get_w``. Here each builder converts the torch checkpoint
into a JAX pytree once at load time and returns a :class:`GeneratorBundle`.

If the pretrained weight file is missing, builders raise FileNotFoundError
unless ``allow_random_init=True`` (or env WGS_ALLOW_RANDOM_G=1), in which case
a randomly initialized generator is returned — useful for smoke tests and
benchmarking on machines without the weight artifacts.
"""
from __future__ import annotations

import os
import os.path as osp

import jax

from warpedganspace_tpu.config import GAN_RESOLUTIONS
from warpedganspace_tpu.models.api import GeneratorBundle
from warpedganspace_tpu.utils.io import load_pt


def _allow_random(flag: bool | None) -> bool:
    if flag is not None:
        return flag
    return os.environ.get("WGS_ALLOW_RANDOM_G", "0") == "1"


def _load_state_dict(path: str, allow_random: bool):
    if osp.isfile(path):
        return load_pt(path)
    if allow_random:
        print(f"#. Warning: weights not found at {path}; using RANDOM generator weights")
        return None
    raise FileNotFoundError(
        f"Pretrained generator weights not found: {path} "
        "(run download_models.py, or set allow_random_init for smoke tests)"
    )


def build_sngan(pretrained_gan_weights: str, gan_type: str, allow_random_init: bool | None = None) -> GeneratorBundle:
    """SNGAN (MNIST 32 / AnimeFaces 64). Parity: models/gan_load.py:31-58."""
    from warpedganspace_tpu.convert import sngan_params_from_state_dict
    from warpedganspace_tpu.models.sngan import SNGANGenerator

    gen = SNGANGenerator.from_gan_type(gan_type)
    sd = _load_state_dict(pretrained_gan_weights, _allow_random(allow_random_init))
    if sd is None:
        params = gen.init(jax.random.key(0))
    else:
        params = sngan_params_from_state_dict(sd, gen.channels)
    return GeneratorBundle(
        name=gan_type,
        dim_z=gen.dim_z,
        resolution=gen.img_size,
        out_channels=gen.image_channels,
        params=params,
        apply_fn=gen.apply,
    )


def build_proggan(pretrained_gan_weights: str, allow_random_init: bool | None = None,
                  remat: bool | str = False,
                  tail_layout: str | None = None) -> GeneratorBundle:
    """ProgGAN 1024^2 CelebA-HQ. Parity: models/gan_load.py:109-129.

    ``tail_layout`` None = auto: the fused Pallas tail on TPU (the inference
    fast path, 2.85x whole-render — ops/proggan_tail_pallas.py), "s2d"
    elsewhere. The training CLI pins "s2d" (the autodiff-native composition;
    the pallas tail's VJP is a slow jnp-twin fallback)."""
    from warpedganspace_tpu.convert import proggan_params_from_state_dict
    from warpedganspace_tpu.models.proggan import ProgGANGenerator

    if tail_layout is None:
        tail_layout = "pallas" if jax.default_backend() == "tpu" else "s2d"
    gen = ProgGANGenerator(remat=remat, tail_layout=tail_layout)
    sd = _load_state_dict(pretrained_gan_weights, _allow_random(allow_random_init))
    params = gen.init(jax.random.key(0)) if sd is None else proggan_params_from_state_dict(sd)
    return GeneratorBundle(
        name="ProgGAN",
        dim_z=gen.dim_z,
        resolution=gen.resolution,
        out_channels=3,
        params=params,
        apply_fn=gen.apply,
        supports_s2d_out=True,
        render_out_layout="nhwc" if tail_layout == "pallas" else None,
    )


def build_stylegan2(
    pretrained_gan_weights: str,
    resolution: int,
    shift_in_w_space: bool = False,
    allow_random_init: bool | None = None,
    remat: bool | str = False,
    tail_layout: str | None = None,
) -> GeneratorBundle:
    """StyleGAN2 FFHQ (256 / 1024, config-f). Parity: models/gan_load.py:145-188.

    ``tail_layout`` None = auto: the fold-x tail on TPU (the fastest render
    layout, +9% whole-render at 1024^2), "s2d" elsewhere. The training CLI
    pins "s2d" (its pair handoff consumes s2d output)."""
    from warpedganspace_tpu.convert.stylegan2 import stylegan2_params_from_state_dict
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    if tail_layout is None:
        tail_layout = "foldx" if jax.default_backend() == "tpu" else "s2d"
    gen = StyleGAN2Generator(resolution=resolution, shift_in_w_space=shift_in_w_space,
                             remat=remat, tail_layout=tail_layout)
    sd = _load_state_dict(pretrained_gan_weights, _allow_random(allow_random_init))
    if sd is None:
        params = gen.init(jax.random.key(0))
    else:
        # Reference loads checkpoint['g_ema'] with strict=False (:186).
        params = stylegan2_params_from_state_dict(sd["g_ema"] if "g_ema" in sd else sd, resolution)
    return GeneratorBundle(
        name="StyleGAN2",
        dim_z=gen.dim_z,
        resolution=resolution,
        out_channels=3,
        params=params,
        apply_fn=gen.apply,
        get_w_fn=gen.get_w,
        shift_in_w_space=shift_in_w_space,
        supports_s2d_out=True,
        render_out_layout="nhwc" if tail_layout == "foldx" else None,
    )


def build_biggan(
    pretrained_gan_weights: str,
    target_classes,
    allow_random_init: bool | None = None,
) -> GeneratorBundle:
    """BigGAN 128^2 class-conditional. Parity: models/gan_load.py:64-101.

    The bundle's apply takes an optional ``y`` (class indices); when omitted, a
    class is drawn per batch element from ``target_classes`` using a key folded
    from the z values — mirroring BigGANWrapper.mixed_classes (:73-77).
    """
    from warpedganspace_tpu.convert.biggan import biggan_params_from_state_dict
    from warpedganspace_tpu.models.biggan import BigGANGenerator

    gen = BigGANGenerator.from_config(target_classes=target_classes)
    sd = _load_state_dict(pretrained_gan_weights, _allow_random(allow_random_init))
    params = gen.init(jax.random.key(0)) if sd is None else biggan_params_from_state_dict(sd)
    return GeneratorBundle(
        name="BigGAN",
        dim_z=gen.dim_z,
        resolution=gen.resolution,
        out_channels=3,
        params=params,
        apply_fn=gen.apply,
    )


def build_gan(
    gan_type: str,
    target_classes=None,
    stylegan2_resolution: int = 1024,
    shift_in_w_space: bool = False,
    weights_root: str = ".",
    allow_random_init: bool | None = None,
    remat: bool | str = False,
    proggan_tail_layout: str | None = None,
    stylegan2_tail_layout: str | None = None,
) -> GeneratorBundle:
    """Dispatcher used by the CLI scripts (parity: traverse_latent_space.py:233-259)."""
    from warpedganspace_tpu.config import GAN_WEIGHTS

    if gan_type == "BigGAN":
        path = osp.join(weights_root, GAN_WEIGHTS[gan_type]["weights"][GAN_RESOLUTIONS[gan_type]])
        return build_biggan(path, target_classes, allow_random_init)
    if gan_type == "ProgGAN":
        path = osp.join(weights_root, GAN_WEIGHTS[gan_type]["weights"][GAN_RESOLUTIONS[gan_type]])
        return build_proggan(path, allow_random_init, remat=remat,
                             tail_layout=proggan_tail_layout)
    if gan_type == "StyleGAN2":
        path = osp.join(weights_root, GAN_WEIGHTS[gan_type]["weights"][stylegan2_resolution])
        return build_stylegan2(path, stylegan2_resolution, shift_in_w_space, allow_random_init,
                               remat=remat, tail_layout=stylegan2_tail_layout)
    path = osp.join(weights_root, GAN_WEIGHTS[gan_type]["weights"][GAN_RESOLUTIONS[gan_type]])
    return build_sngan(path, gan_type, allow_random_init)
