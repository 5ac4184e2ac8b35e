"""Attribute-space traversal CLI (parity: reference ``traverse_attribute_space.py``).

For every latent-code hash of a traversal config, measures 6 predictor families
over the saved path-image sequences and writes eval_json/*.json +
eval_np/*.npy with the reference's exact file and array schema (:538-605):
face_{width,height}, identity, age, race, gender, yaw/pitch/roll,
au_*_<name>, celeba_*.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

from warpedganspace_tpu.evalzoo import load as zoo
from warpedganspace_tpu.evalzoo.crop_resize import crop_resize, plan_crop_resize
from warpedganspace_tpu.evalzoo.transforms import (
    crop_rect,
    normalize_imagenet,
    resize_center,
)
from warpedganspace_tpu.utils.aux import update_progress, update_stdout
from warpedganspace_tpu.utils.data import PathImages
from warpedganspace_tpu.utils.io import load_pt

# Action Units (reference :16-29).
AUs = {
    "au_1": "Inner_Brow_Raiser",
    "au_2": "Outer_Brow_Raiser",
    "au_4": "Brow_Lowerer",
    "au_5": "Upper_Lid_Raiser",
    "au_6": "Cheek_Raiser",
    "au_9": "Nose_Wrinkler",
    "au_12": "Lip_Corner_Puller",
    "au_15": "Lip_Corner_Depressor",
    "au_17": "Chin_Raiser",
    "au_20": "Lip_stretcher",
    "au_25": "Lips_part",
    "au_26": "Jaw_Drop",
}


class ModelArgs:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


def build_parser():
    parser = argparse.ArgumentParser(description="WarpedGANSpace attribute space traversal script")
    parser.add_argument("-v", "--verbose", action="store_true", help="set verbose mode on")
    parser.add_argument("--exp", type=str, required=True,
                        help="set experiment's model dir (created by `train.py` and used by "
                             "`traverse_latent_space.py`.)")
    parser.add_argument("--pool", type=str, required=True,
                        help="choose pool of pre-defined latent codes and their latent traversals")
    parser.add_argument("--shift-steps", type=int, default=16,
                        help="number of shifts per positive/negative path direction")
    parser.add_argument("--eps", type=float, help="shift magnitude")
    parser.add_argument("--cuda", dest="cuda", action="store_true",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--no-cuda", dest="cuda", action="store_false",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--num-shards", type=int, default=1,
                        help="host-level scale-out: total number of independent "
                             "processes splitting the hash dirs (each process "
                             "evaluates hashes shard-index::num-shards)")
    parser.add_argument("--shard-index", type=int, default=0,
                        help="this process's shard index in [0, num-shards)")
    parser.add_argument("--multi-device", action="store_true",
                        help="shard each path's frame batch over all visible "
                             "devices (data parallel; the frame axis is padded "
                             "to the device count and results sliced back)")
    parser.set_defaults(cuda=True)
    return parser


def load_predictors():
    """Build the 6 predictor families from models/pretrained/ weights."""
    return {
        "sfd": zoo.load_sfd(),
        "id": zoo.load_arcface(),
        "fairface": zoo.load_fairface(),
        "hopenet": zoo.load_hopenet(),
        "au": zoo.load_audetector(),
        "celeba": zoo.load_celeba(),
    }


def _prep_path(path_dir: str, gan_type: str):
    """Host stage for one path, run on the prefetch pool: JPEG decode + the
    256^2 and CelebA 224^2 resizes (the only full-frame host resizes left —
    face crops are gathered on device from the 256^2 batch)."""
    frames = PathImages(path_dir).load_all()
    frames256 = resize_center(frames, 256)  # (T, 256, 256, 3) in [0, 255]
    # CelebA normalization (reference :346-365): StyleGAN2 frames are treated
    # as [-1, 1]-scaled; others min-max normalized over the whole path batch.
    if gan_type == "StyleGAN2":
        celeba_norm = frames / 255.0 * 2.0 - 1.0
    else:
        lo, hi = frames.min(), frames.max()
        celeba_norm = (frames - lo) / (hi - lo)
    celeba_in = normalize_imagenet(resize_center(celeba_norm, 224))
    return frames256, celeba_in


def evaluate_hash_dir(h_dir: str, predictors: dict, gan_type: str, verbose: bool = False,
                      mesh=None):
    """Evaluate all paths of one latent-code hash dir and write eval outputs.

    Mirrors the reference per-hash loop (:252-536), restructured as a device
    pipeline (round-3): JPEG decode + full-frame resizes run ahead on a host
    thread pool while the device stream works; the 256^2 frame batch is
    shipped ONCE per path and every downstream input derives from it on
    device — the ID normalization is an on-device affine and the
    FairFace/HopeNet/AU face crops are bilinear gathers (crop_resize.py)
    driven by the host NMS rectangles. Per-path host->device traffic drops
    ~3x (one 256^2 + one 224^2 batch instead of six full batches) and the
    host's per-crop cv2 resizes disappear.

    With ``mesh`` (the --multi-device flag), the frame axis of every device
    batch is sharded over the mesh: the path length (always odd, 2*steps+1)
    is padded to the device count by repeating the last frame, all predictor
    outputs come back frame-sharded and are sliced to the true length —
    numerically the single-device result up to reduction order.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp
    from warpedganspace_tpu.evalzoo.hopenet import Hopenet
    from warpedganspace_tpu.parallel import batch_sharding

    paths_latent_codes = np.asarray(load_pt(osp.join(h_dir, "paths_latent_codes.pt")))
    num_of_paths = paths_latent_codes.shape[0]
    num_per_path = paths_latent_codes.shape[1]

    ndev = 1 if mesh is None else int(mesh.devices.size)
    pad = (-num_per_path) % ndev

    def to_device(x):
        """Upload a (T, ...) host batch, frame-sharded over the mesh if any."""
        if mesh is None:
            return jnp.asarray(x)
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        # device_put the HOST array directly under the sharding: each device
        # receives only its slice. (jnp.asarray first would commit the whole
        # batch to device 0 and then reshard — a second full-batch transfer.)
        return jax.device_put(np.asarray(x), batch_sharding(mesh))
    path_images_dir = osp.join(h_dir, "paths_images")
    dicts = {k: {} for k in (
        "face_bbox", "id", "gender", "age", "race", "pose", "aus",
        "celeba_bangs", "celeba_eyeglasses", "celeba_beard", "celeba_smiling", "celeba_age",
    )}
    nps = {
        k: np.zeros((num_of_paths, num_per_path))
        for k in (
            "face_width", "face_height", "identity", "gender", "age", "race",
            "yaw", "pitch", "roll", "celeba_bangs", "celeba_eyeglasses",
            "celeba_beard", "celeba_smiling", "celeba_age",
        )
    }
    aus_np = np.zeros((len(AUs), num_of_paths, num_per_path))

    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1))
    prefetch = 3
    prepped = {
        d: pool.submit(_prep_path, osp.join(path_images_dir, f"path_{d:03d}"), gan_type)
        for d in range(min(prefetch, num_of_paths))
    }

    try:
        for d in range(num_of_paths):
            if verbose:
                update_progress("               \\__path: {:03d}/{:03d} ".format(d + 1, num_of_paths),
                                num_of_paths, d + 1)
            frames256, celeba_in = prepped.pop(d).result()
            nxt = d + prefetch
            if nxt < num_of_paths:
                prepped[nxt] = pool.submit(
                    _prep_path, osp.join(path_images_dir, f"path_{nxt:03d}"), gan_type)
            f256_dev = to_device(frames256)  # the ONE full-frame upload per path

            # --- face detection -------------------------------------------------
            detected_faces, _, _ = predictors["sfd"].detect_from_batch(f256_dev)
            bbox_list, face_w, face_h = [], [], []
            for t in range(num_per_path):
                if len(detected_faces[t]) > 0:
                    bbox = list(np.asarray(detected_faces[t][0], dtype=float))
                    bbox_list.append(bbox)
                    face_w.append((bbox[2] - bbox[0]) / 256.0)
                    face_h.append((bbox[3] - bbox[1]) / 256.0)
                else:
                    face_w.append(256.0)
                    face_h.append(256.0)
            dicts["face_bbox"][d] = bbox_list
            nps["face_width"][d] = face_w
            nps["face_height"][d] = face_h

            # --- CelebA attributes (reference :346-387; input prepped on pool) --
            preds = predictors["celeba"](to_device(celeba_in))
            for attr, logits in preds.items():
                p = np.asarray(jnp.exp(logits) / jnp.sum(jnp.exp(logits), axis=1, keepdims=True))[:num_per_path]
                final = (np.argmax(p, axis=1) + np.max(p, axis=1)) / 6.0
                key = {"Bangs": "celeba_bangs", "Eyeglasses": "celeba_eyeglasses",
                       "No_Beard": "celeba_beard", "Smiling": "celeba_smiling",
                       "Young": "celeba_age"}[attr]
                nps[key][d] = final
                dicts[key][d] = final.tolist()

            # --- identity vs center frame (:395-415). The reference walks outward
            # one pair per forward; the resulting list is exactly [cos(center,
            # frame_t)] in frame order, so one batched call computes all T pairs.
            # The [-1, 1] scaling is an on-device affine of the already-staged
            # frame batch.
            scaled = f256_dev / 255.0 * 2.0 - 1.0
            center = jnp.broadcast_to(scaled[num_per_path // 2][None], scaled.shape)
            id_scores = [float(v) for v in
                         predictors["id"].similarities(center, scaled)[:num_per_path]]
            dicts["id"][d] = id_scores
            nps["identity"][d] = id_scores

            # --- face crops: gathered on DEVICE from the staged 256^2 batch; the
            # host contributes only the NMS rectangles (:423-531 semantics; the
            # /255 "divide" commutes with the linear resize). ---------------------
            def cropped_batch(size, padding, divide):
                rects = [
                    crop_rect(detected_faces[t][0][:-1] if len(detected_faces[t]) > 0
                              else [0, 0, 256, 256],
                              frames256.shape[1], frames256.shape[2], padding)
                    for t in range(len(detected_faces))
                ]
                crops = crop_resize(f256_dev, plan_crop_resize(rects, size))
                return crops / 255.0 if divide else crops

            ff_in = normalize_imagenet(cropped_batch(224, 0.25, divide=True))
            outputs = np.asarray(predictors["fairface"](ff_in))[:num_per_path]

            gender = np.exp(outputs[:, 7:9])
            gender /= gender.sum(axis=1, keepdims=True)
            nps["gender"][d] = gender[:, 1]
            dicts["gender"][d] = gender[:, 1].tolist()

            age = np.exp(outputs[:, 9:18])
            age /= age.sum(axis=1, keepdims=True)
            age_pred = (np.argmax(age, axis=1) + np.max(age, axis=1)) / 9.0
            nps["age"][d] = age_pred
            dicts["age"][d] = age_pred.tolist()

            race = np.exp(outputs[:, :7])
            race /= race.sum(axis=1, keepdims=True)
            race_pred = (np.argmax(race, axis=1) + np.max(race, axis=1)) / 7.0
            nps["race"][d] = race_pred
            dicts["race"][d] = race_pred.tolist()

            # --- pose (:475-504) -------------------------------------------------
            hp_in = normalize_imagenet(cropped_batch(224, 0.0, divide=True))
            yaw_l, pitch_l, roll_l = predictors["hopenet"](hp_in)
            yaw_deg = np.asarray(Hopenet.angles_deg(yaw_l))[:num_per_path]
            pitch_deg = np.asarray(Hopenet.angles_deg(pitch_l))[:num_per_path]
            roll_deg = np.asarray(Hopenet.angles_deg(roll_l))[:num_per_path]
            dicts["pose"][d] = [yaw_deg.tolist(), pitch_deg.tolist(), roll_deg.tolist()]
            nps["yaw"][d] = yaw_deg * np.pi / 180
            nps["pitch"][d] = pitch_deg * np.pi / 180
            nps["roll"][d] = roll_deg * np.pi / 180

            # --- action units (:512-531) ----------------------------------------
            au_in = cropped_batch(256, 0.0, divide=False)
            intensities = np.asarray(predictors["au"].detect_AU(au_in)).T[:, :num_per_path]  # (12, T)
            aus_list = []
            for t in range(len(AUs)):
                aus_list.append(intensities[t].tolist())
                aus_np[t, d, :] = intensities[t]
            dicts["aus"][d] = aus_list

    finally:
        pool.shutdown(wait=False, cancel_futures=True)

    # --- write outputs (reference :538-605) ----------------------------------
    json_dir = osp.join(h_dir, "eval_json")
    np_dir = osp.join(h_dir, "eval_np")
    os.makedirs(json_dir, exist_ok=True)
    os.makedirs(np_dir, exist_ok=True)

    def dump(json_name, d_key, np_names):
        with open(osp.join(json_dir, json_name + ".json"), "w") as f:
            json.dump(dicts[d_key], f)
        for np_name in np_names:
            np.save(osp.join(np_dir, np_name + ".npy"), nps[np_name])

    dump("face_bbox", "face_bbox", ["face_width", "face_height"])
    dump("identity", "id", ["identity"])
    dump("age", "age", ["age"])
    dump("race", "race", ["race"])
    dump("gender", "gender", ["gender"])
    dump("pose", "pose", ["yaw", "pitch", "roll"])
    with open(osp.join(json_dir, "au.json"), "w") as f:
        json.dump(dicts["aus"], f)
    for t, k in enumerate(AUs):
        np.save(osp.join(np_dir, "{}_{}.npy".format(k, AUs[k])), aus_np[t])
    for name in ("celeba_bangs", "celeba_eyeglasses", "celeba_beard",
                 "celeba_smiling", "celeba_age"):
        dump(name, name, [name])


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from warpedganspace_tpu.parallel import initialize_distributed

    initialize_distributed()

    # Same always-on shard validation as traverse_latent_space.py: an invalid
    # combination must fail loudly instead of silently evaluating everything.
    if args.num_shards < 1:
        raise ValueError(f"--num-shards must be >= 1 (got {args.num_shards})")
    if not 0 <= args.shard_index < args.num_shards:
        raise ValueError(
            f"--shard-index {args.shard_index} out of range for "
            f"{args.num_shards} shards")

    # Under jax.distributed: hash dirs partition over processes automatically
    # (disjoint files, local-device predictors — same scheme as
    # traverse_latent_space.py).
    if jax.process_count() > 1:
        if args.num_shards != 1:
            raise ValueError(
                "--num-shards is for unconnected hosts; under jax.distributed "
                "the hash dirs are partitioned over processes automatically")
        args.num_shards = jax.process_count()
        args.shard_index = jax.process_index()

    mesh = None
    if args.multi_device:
        from warpedganspace_tpu.parallel import make_mesh

        devs = jax.local_devices() if jax.process_count() > 1 else jax.devices()
        if len(devs) > 1:
            mesh = make_mesh(devs)

    latent_traversal_dir = osp.join(args.exp, "results", args.pool)
    if not osp.isdir(args.exp):
        raise NotADirectoryError("Error: invalid experiment's directory: {}".format(args.exp))
    args_json_file = osp.join(args.exp, "args.json")
    if not osp.isfile(args_json_file):
        raise FileNotFoundError("File not found: {}".format(args_json_file))
    args_json = ModelArgs(**json.load(open(args_json_file)))
    gan_type = args_json.gan_type
    if not osp.isdir(latent_traversal_dir):
        raise NotADirectoryError("Error: pool directory {} not found under {}".format(
            args.pool, osp.join(args.exp, "results")))

    # The reference gates auto-discovery on BOTH flags being None, but its
    # --shift-steps has a default, making that branch unreachable (omitting
    # --eps then crashes computing the config name). Honor the documented
    # intent instead: no --eps -> scan the existing traversal config dirs.
    if args.eps is None:
        configs = [d for d in os.listdir(latent_traversal_dir)
                   if osp.isdir(osp.join(latent_traversal_dir, d))]
    else:
        configs = ["{}_{}_{}".format(2 * args.shift_steps, args.eps,
                                     round(2 * args.shift_steps * args.eps, 3))]

    if args.verbose:
        print("#. Calculate attribute traversals in {}".format(latent_traversal_dir))
        print("  \\__.Latent space traversal configs: {}".format(configs))

    predictors = load_predictors()

    for l_config in configs:
        if args.verbose:
            print("       \\__.Latent space traversal config: {}".format(l_config))
        hashes_dir = osp.join(latent_traversal_dir, l_config)
        hashes = sorted(d for d in os.listdir(hashes_dir)
                        if osp.isdir(osp.join(hashes_dir, d))
                        and d not in ("paths_gifs", "validation_results",
                                      "interpretable_paths"))
        if args.num_shards > 1:
            from warpedganspace_tpu.parallel import partition_work

            hashes = partition_work(hashes, args.num_shards, args.shard_index)
        for cnt, h in enumerate(hashes, start=1):
            if args.verbose:
                print("           \\__.hash: {} [{}/{}]".format(h, cnt, len(hashes)))
            evaluate_hash_dir(osp.join(hashes_dir, h), predictors, gan_type,
                              verbose=args.verbose, mesh=mesh)

    if args.verbose:
        update_stdout(1)
        print()


if __name__ == "__main__":
    main()
