"""Latent-pool sampling CLI (parity: reference ``sample_gan.py``).

Samples N latent codes, generates their images, and stores each pair under
experiments/latent_codes/<gan_type>(<classes>)/<pool>/<sha1(z)>/
{latent_code.pt, image.jpg} — the pool consumed by the traversal stage.
latent_code.pt is written in torch format, so pools are interchangeable with
the reference implementation in both directions.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from hashlib import sha1

import numpy as np

from warpedganspace_tpu.config import GAN_RESOLUTIONS, GAN_WEIGHTS
from warpedganspace_tpu.core.sampling import sample_z
from warpedganspace_tpu.models.gan_load import build_gan
from warpedganspace_tpu.traverse.images import tensor2image
from warpedganspace_tpu.utils.aux import update_progress, update_stdout
from warpedganspace_tpu.utils.io import save_pt


def build_parser():
    parser = argparse.ArgumentParser(
        description="Sample a pre-trained GAN latent space and generate images"
    )
    parser.add_argument("-v", "--verbose", action="store_true", help="set verbose mode on")
    parser.add_argument("-g", "--gan-type", type=str, required=True,
                        choices=list(GAN_WEIGHTS.keys()), help="GAN generator model type")
    parser.add_argument("--shift-in-w-space", action="store_true",
                        help="search latent paths in StyleGAN2's W-space")
    parser.add_argument("--z-truncation", type=float,
                        help="set latent code sampling truncation parameter")
    parser.add_argument("--biggan-target-classes", nargs="+", type=int,
                        help="list of classes for conditional BigGAN")
    parser.add_argument("--stylegan2-resolution", type=int, default=1024, choices=(256, 1024),
                        help="StyleGAN2 image resolution")
    parser.add_argument("--num-samples", type=int, default=4,
                        help="number of latent codes to sample")
    parser.add_argument("--pool", type=str, help="name of latent codes/images pool")
    parser.add_argument("--seed", type=int, default=0, help="RNG seed")
    parser.add_argument("--cuda", dest="cuda", action="store_true",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--no-cuda", dest="cuda", action="store_false",
                        help="accepted for reference-script compatibility (ignored)")
    parser.set_defaults(cuda=True)
    return parser


def main(argv=None):
    import jax

    from warpedganspace_tpu.parallel import (
        initialize_distributed, is_coordinator, sync_processes)

    parser = build_parser()
    args = parser.parse_args(argv)

    # Process-independent arg validation runs BEFORE the coordinator gate:
    # if it ran after, a misconfigured multi-host launch would have process 0
    # exit via parser.error while every other process blocks at the barrier
    # below until the coordination-service timeout.
    if args.gan_type == "BigGAN" and args.biggan_target_classes is None:
        parser.error("In case of BigGAN, a list of classes needs to be determined.")

    # Pool creation is cheap and single-writer: under jax.distributed only
    # process 0 samples/writes; the rest wait at the barrier so downstream
    # stages see a complete pool. The barrier is reached on EVERY control path
    # (try/finally below): a coordinator exception after this gate must not
    # leave the other hosts hung until the coordination-service timeout — it
    # propagates as process 0's non-zero exit, which the launcher observes.
    initialize_distributed()
    if not is_coordinator():
        sync_processes("sample-gan-done")
        return
    try:
        _sample_pool(args)
    finally:
        sync_processes("sample-gan-done")


def _sample_pool(args):
    """Coordinator-only pool sampling body (reference sample_gan.py:32-184)."""
    import jax

    out_dir = osp.join("experiments", "latent_codes", args.gan_type)
    biggan_classes = None
    if args.gan_type == "BigGAN":
        biggan_classes = ""
        for c in args.biggan_target_classes:
            biggan_classes += "-{}".format(c)
        out_dir += biggan_classes
    if args.pool:
        out_dir = osp.join(out_dir, args.pool)
    else:
        out_dir = osp.join(
            out_dir,
            "{}_{}".format(
                args.gan_type + biggan_classes if args.gan_type == "BigGAN" else args.gan_type,
                args.num_samples,
            ),
        )
    os.makedirs(out_dir, exist_ok=True)

    with open(osp.join(out_dir, "args.json"), "w") as f:
        json.dump(args.__dict__, f)

    if args.verbose:
        print("#. Build GAN generator model G and load with pre-trained weights...")
        print("  \\__GAN type: {}".format(args.gan_type))
        if args.gan_type == "BigGAN":
            print("      \\__Target classes: {}".format(args.biggan_target_classes))
        print("  \\__Pre-trained weights: {}".format(
            GAN_WEIGHTS[args.gan_type]["weights"][args.stylegan2_resolution]
            if args.gan_type == "StyleGAN2"
            else GAN_WEIGHTS[args.gan_type]["weights"][GAN_RESOLUTIONS[args.gan_type]]))

    G = build_gan(
        gan_type=args.gan_type,
        target_classes=args.biggan_target_classes,
        stylegan2_resolution=args.stylegan2_resolution,
        shift_in_w_space=args.shift_in_w_space,
    )

    if args.verbose:
        print("#. Sample {} {}-dimensional latent codes...".format(args.num_samples, G.dim_z))
        if args.z_truncation:
            print("  \\__Truncate standard Gaussian to range [{}, +{}]".format(
                -args.z_truncation, args.z_truncation))

    zs = sample_z(jax.random.key(args.seed), args.num_samples, G.dim_z, args.z_truncation)
    zs_np = np.asarray(zs)

    if args.verbose:
        print("#. Generate images...")
        print("  \\__{}".format(out_dir))

    for i in range(args.num_samples):
        z = zs_np[i : i + 1]
        latent_code_hash = sha1(z).hexdigest()
        if args.verbose:
            update_progress(
                "  \\__.Latent code hash: {} [{:03d}/{:03d}] ".format(
                    latent_code_hash, i + 1, args.num_samples),
                args.num_samples, i)
        latent_code_dir = osp.join(out_dir, "{}".format(latent_code_hash))
        os.makedirs(latent_code_dir, exist_ok=True)
        save_pt(z, osp.join(latent_code_dir, "latent_code.pt"))

        img = np.asarray(G(zs[i : i + 1]))[0]  # (H, W, C)
        pil = tensor2image(img, adaptive=True)
        pil.save(osp.join(latent_code_dir, "image.jpg"), "JPEG",
                 quality=95, optimize=True, progressive=True)

    if args.verbose:
        update_stdout(1)
        print()
        print()


if __name__ == "__main__":
    main()
