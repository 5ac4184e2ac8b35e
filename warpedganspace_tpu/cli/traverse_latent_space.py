"""Latent-space traversal CLI (parity: reference ``traverse_latent_space.py``).

Traverses the latent space of a trained experiment's GAN along the K warped
paths for every latent code of a pool, writing the reference results tree:

    <EXP_DIR>/results/<pool>/<2*steps>_<eps>_<len>/<hash>/
        paths_images/path_<k>/<t:06d>.jpg
        paths_latent_codes.pt
        original_image.jpg
    (+ paths_gifs/path_<k>.gif with --gif)

TPU-first: the whole (codes x paths x steps) traversal is ONE compiled
lax.scan program (see traverse/engine.py); only JPEG encoding stays on host.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

import jax.numpy as jnp

from warpedganspace_tpu.models.gan_load import build_gan
from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.traverse import iter_rendered_u8, traverse_paths
from warpedganspace_tpu.traverse.gifs import collate_traversal_gifs
from warpedganspace_tpu.utils.aux import update_progress, update_stdout
from warpedganspace_tpu.utils.io import load_pt, save_pt


class ModelArgs:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


def build_parser():
    parser = argparse.ArgumentParser(description="WarpedGANSpace latent space traversal script")
    parser.add_argument("-v", "--verbose", action="store_true", help="set verbose mode on")
    parser.add_argument("--exp", type=str, required=True,
                        help="set experiment's model dir (created by `train.py`)")
    parser.add_argument("--pool", type=str, required=True,
                        help="directory of pre-defined pool of latent codes (created by `sample_gan.py`)")
    parser.add_argument("--shift-steps", type=int, default=16,
                        help="set number of shifts per positive/negative path direction")
    parser.add_argument("--eps", type=float, default=0.2, help="set shift step magnitude")
    parser.add_argument("--shift-leap", type=int, default=1,
                        help="set path shift leap (after how many steps to generate images)")
    parser.add_argument("--batch-size", type=int,
                        help="set generator batch size (if not set, use the total number of images per path)")
    parser.add_argument("--img-size", type=int,
                        help="set size of saved generated images (if not set, use the output "
                             "size of the respective GAN generator)")
    parser.add_argument("--img-quality", type=int, default=75, help="set JPEG image quality")
    parser.add_argument("--gif", action="store_true", help="Create GIF traversals")
    parser.add_argument("--gif-size", type=int, default=256, help="set gif resolution")
    parser.add_argument("--gif-fps", type=int, default=30, help="set gif frame rate")
    parser.add_argument("--cuda", dest="cuda", action="store_true",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--no-cuda", dest="cuda", action="store_false",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--multi-device", action="store_true",
                        help="shard the K paths over all visible TPU devices")
    parser.add_argument("--num-shards", type=int, default=1,
                        help="host-level scale-out: total number of independent "
                             "processes splitting the latent-code pool (each "
                             "process handles codes shard-index::num-shards; "
                             "no cross-process communication needed)")
    parser.add_argument("--shard-index", type=int, default=0,
                        help="this process's shard index in [0, num-shards)")
    parser.add_argument("--dtype", type=str, default="float32", choices=("float32", "bfloat16"),
                        help="generator compute dtype; bfloat16 renders ~measurably faster "
                             "on TPU at >40dB PSNR vs float32 (the warp integration always "
                             "runs in float32)")
    parser.add_argument("--warp-backend", type=str, default="auto",
                        choices=("auto", "pallas", "jnp"),
                        help="RBF warp implementation for path integration: the fused "
                             "Pallas kernel (default on TPU; 2.4x) or the jnp all-sets "
                             "formulation")
    parser.set_defaults(cuda=True)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from warpedganspace_tpu.parallel import initialize_distributed

    initialize_distributed()

    # Validate the shard arguments even when sharding is off: a --shard-index
    # with a defaulted/invalid --num-shards must fail loudly, not silently run
    # the full pool in every process (duplicated, file-racing work).
    if args.num_shards < 1:
        raise ValueError(f"--num-shards must be >= 1 (got {args.num_shards})")
    if not 0 <= args.shard_index < args.num_shards:
        raise ValueError(
            f"--shard-index {args.shard_index} out of range for "
            f"{args.num_shards} shards")

    # Under jax.distributed the latent-code pool is partitioned over the
    # processes automatically (each process renders a disjoint hash subset on
    # its LOCAL devices — traversal is embarrassingly parallel over codes, so
    # no cross-process collectives are needed and a 2-host run produces the
    # same tree as one host in half the wall time). Manual --num-shards is for
    # UNCONNECTED hosts and would double-partition here.
    multiproc = jax.process_count() > 1
    if multiproc:
        if args.num_shards != 1:
            raise ValueError(
                "--num-shards is for unconnected hosts; under jax.distributed "
                "the pool is partitioned over processes automatically")
        args.num_shards = jax.process_count()
        args.shard_index = jax.process_index()

    if not osp.isdir(args.exp):
        raise NotADirectoryError("Invalid given directory: {}".format(args.exp))
    args_json_file = osp.join(args.exp, "args.json")
    if not osp.isfile(args_json_file):
        raise FileNotFoundError("File not found: {}".format(args_json_file))
    args_json = ModelArgs(**json.load(open(args_json_file)))
    gan_type = args_json.gan_type

    models_dir = osp.join(args.exp, "models")
    if not osp.isdir(models_dir):
        raise NotADirectoryError("Invalid models directory: {}".format(models_dir))

    # Final support_sets.pt, else the newest support_sets-<iter>.pt checkpoint
    # (reference traverse_latent_space.py:200-208).
    support_sets_model = osp.join(models_dir, "support_sets.pt")
    if not osp.isfile(support_sets_model):
        def _ckpt_iter(f):
            # Numeric sort (robustness fix over the reference's lexicographic
            # sort, traverse_latent_space.py:396, which picks 9000 over 10000).
            try:
                return int(f.split("support_sets-")[1].split(".pt")[0])
            except (IndexError, ValueError):
                return -1

        ckpts = sorted(
            (f for f in os.listdir(models_dir) if "support_sets-" in f), key=_ckpt_iter
        )
        if not ckpts:
            raise FileNotFoundError("No support sets weights found under {}".format(models_dir))
        support_sets_model = osp.join(models_dir, ckpts[-1])

    # Pool directory (reference :220-231).
    pool = osp.join("experiments", "latent_codes")
    if gan_type == "BigGAN":
        classes = ""
        for c in args_json.biggan_target_classes:
            classes += "-{}".format(c)
        pool = osp.join(pool, gan_type + classes, args.pool)
    else:
        pool = osp.join(pool, gan_type, args.pool)
    if not osp.isdir(pool):
        raise NotADirectoryError(
            "Invalid pool directory: {} -- Please run sample_gan.py to create it.".format(pool))

    if args.verbose:
        print("#. Build GAN generator model G and load with pre-trained weights...")
        print("  \\__GAN type: {}".format(gan_type))

    shift_in_w_space = bool(getattr(args_json, "shift_in_w_space", False))
    G = build_gan(
        gan_type=gan_type,
        target_classes=getattr(args_json, "biggan_target_classes", None),
        stylegan2_resolution=getattr(args_json, "stylegan2_resolution", 1024),
        shift_in_w_space=shift_in_w_space,
    )

    if args.verbose:
        print("#. Build support sets model S...")
        print("  \\__Pre-trained weights: {}".format(support_sets_model))

    S = SupportSets(
        num_support_sets=args_json.num_support_sets,
        num_support_dipoles=args_json.num_support_dipoles,
        support_vectors_dim=G.dim_z,
        learn_alphas=args_json.learn_alphas,
        learn_gammas=args_json.learn_gammas,
        gamma=1.0 / G.dim_z if args_json.gamma is None else args_json.gamma,
    )
    s_params = S.from_torch_state_dict(load_pt(support_sets_model))
    num_gen_paths = S.num_support_sets

    out_dir = osp.join(
        args.exp, "results", args.pool,
        "{}_{}_{}".format(2 * args.shift_steps, args.eps,
                          round(2 * args.shift_steps * args.eps, 3)))
    os.makedirs(out_dir, exist_ok=True)

    if args.batch_size is None:
        args.batch_size = 2 * args.shift_steps + 1

    # Latent codes pool.
    if args.verbose:
        print("#. Use latent codes from pool {}...".format(args.pool))
    latent_codes_dirs = sorted(
        d for d in os.listdir(pool) if osp.isdir(osp.join(pool, d)))
    if not latent_codes_dirs:
        # A GLOBALLY empty pool is a setup error (e.g. an interrupted
        # sample_gan) on every process — fail loudly before partitioning,
        # otherwise a sharded/multi-process run would partition emptiness to
        # every process and exit 0 with no tree (and --gif would collate an
        # empty dir). Only a non-empty global pool with an empty PER-PROCESS
        # partition is legal (more processes than codes).
        raise ValueError(f"latent-code pool {pool} contains no latent codes")
    if args.num_shards > 1:
        from warpedganspace_tpu.parallel import partition_work

        if args.gif and not multiproc:
            raise ValueError(
                "--gif needs every code's traversal on disk; run the GIF "
                "collation as a separate unsharded pass after all shards finish")
        latent_codes_dirs = partition_work(
            latent_codes_dirs, args.num_shards, args.shard_index)
        if not latent_codes_dirs and not multiproc:
            print("#. Shard {}/{} has no latent codes; nothing to do.".format(
                args.shard_index, args.num_shards))
            return
    if latent_codes_dirs:
        zs = np.concatenate(
            [np.asarray(load_pt(osp.join(pool, d, "latent_code.pt"))) for d in latent_codes_dirs]
        ).astype(np.float32)
        num_of_latent_codes = zs.shape[0]

        if args.verbose:
            print("#. Traverse latent space...")
            print("  \\__Experiment       : {}".format(osp.basename(osp.abspath(args.exp))))
            print("  \\__Shift magnitude  : {}".format(args.eps))
            print("  \\__Shift steps      : {}".format(2 * args.shift_steps))
            print("  \\__Traversal length : {}".format(round(2 * args.shift_steps * args.eps, 3)))
            print("  \\__Save results at  : {}".format(out_dir))

        # One compiled program integrates ALL (codes x paths x steps).
        mesh = None
        if getattr(args, "multi_device", False):
            from warpedganspace_tpu.parallel import make_mesh

            # Each process renders its own code subset: the render mesh stays
            # LOCAL (global-mesh SPMD would deadlock on divergent work lists).
            devs = jax.local_devices() if multiproc else jax.devices()
            if len(devs) > 1:
                mesh = make_mesh(devs)
        g_params = G.params
        if args.dtype == "bfloat16":
            from warpedganspace_tpu.models.api import cast_params_bf16

            g_params = cast_params_bf16(G.params)
        latents = jnp.asarray(zs)
        if shift_in_w_space:
            # The warp integration stays float32 regardless of the render dtype.
            latents = G.get_w(G.params, latents)
        use_pallas = None if args.warp_backend == "auto" else (args.warp_backend == "pallas")
        codes, shifts = traverse_paths(
            S, s_params, latents, eps=args.eps, shift_steps=args.shift_steps,
            shift_leap=args.shift_leap, mesh=mesh, use_pallas=use_pallas)
        codes_np = np.asarray(codes)

        g_params_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

        from warpedganspace_tpu.traverse.writer import AsyncImageWriter

        writer = AsyncImageWriter()
        try:
            _traverse_all(args, G, g_params, g_params_dtype, S, codes, shifts, codes_np,
                          latent_codes_dirs, num_of_latent_codes, num_gen_paths, out_dir,
                          shift_in_w_space, writer)
        finally:
            writer.close()

    if args.gif:
        if multiproc:
            from warpedganspace_tpu.parallel import is_coordinator, sync_processes

            # Collation reads every code's frames: wait for all processes'
            # writers, then let exactly one process build the GIFs.
            sync_processes("traversal-frames-done")
            if not is_coordinator():
                return
        collate_traversal_gifs(
            out_dir, num_gen_paths, gif_size=args.gif_size, gif_fps=args.gif_fps,
            verbose=args.verbose)


def _traverse_all(args, G, g_params, g_params_dtype, S, codes, shifts, codes_np,
                  latent_codes_dirs, num_of_latent_codes, num_gen_paths, out_dir,
                  shift_in_w_space, writer):
    num_frames = codes.shape[2]
    for i in range(num_of_latent_codes):
        latent_code_hash = latent_codes_dirs[i]
        if args.verbose:
            update_progress(
                "  \\__.Latent code hash: {} [{:03d}/{:03d}] ".format(
                    latent_code_hash, i + 1, num_of_latent_codes),
                num_of_latent_codes, i)

        latent_code_dir = osp.join(out_dir, "{}".format(latent_code_hash))
        os.makedirs(latent_code_dir, exist_ok=True)
        transformed_images_root_dir = osp.join(latent_code_dir, "paths_images")
        os.makedirs(transformed_images_root_dir, exist_ok=True)
        path_dirs = []
        for dim in range(num_gen_paths):
            d = osp.join(transformed_images_root_dir, "path_{:03d}".format(dim))
            os.makedirs(d, exist_ok=True)
            path_dirs.append(d)

        # ALL of this code's frames (every path x every step) as ONE flat
        # render stream: frames of different paths share device batches (no
        # underfilled per-path tails, one dispatch chain instead of K), frames
        # come back uint8 (device-side conversion), and JPEG encodes overlap
        # on the writer's thread pool.
        flat_codes = codes[i].reshape(num_gen_paths * num_frames, -1)
        flat_shifts = shifts[i].reshape(num_gen_paths * num_frames, -1)
        done_paths = 0
        for start, imgs in iter_rendered_u8(
            G, g_params, flat_codes, flat_shifts, batch_size=args.batch_size,
            latent_is_w=shift_in_w_space, dtype=g_params_dtype,
        ):
            for j in range(imgs.shape[0]):
                dim, t = divmod(start + j, num_frames)
                writer.submit(imgs[j],
                              osp.join(path_dirs[dim], "{:06d}.jpg".format(t)),
                              img_size=args.img_size, quality=args.img_quality)
                if dim == 0 and t == num_frames // 2:
                    writer.submit(imgs[j], osp.join(latent_code_dir, "original_image.jpg"),
                                  img_size=args.img_size, quality=95)
            if args.verbose:
                completed = (start + imgs.shape[0]) // num_frames
                while done_paths < completed:
                    done_paths += 1
                    print()
                    update_progress(
                        "      \\__path: {:03d}/{:03d} ".format(done_paths, num_gen_paths),
                        num_gen_paths, done_paths)
                    update_stdout(1)

        # (K, T, dim) latent codes of all paths for this sample (reference :488-490).
        save_pt(codes_np[i], osp.join(latent_code_dir, "paths_latent_codes.pt"))

        if args.verbose:
            update_stdout(1)
            print()
            print()


if __name__ == "__main__":
    main()
