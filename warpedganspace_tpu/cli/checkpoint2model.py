"""Checkpoint splitter CLI (parity: reference ``checkpoint2model.py``).

Splits models/checkpoint.pt into iteration-stamped support_sets-<it>.pt and
reconstructor-<it>.pt weight files; the traversal CLI falls back to the newest
support_sets-<it>.pt when no final support_sets.pt exists.
"""
from __future__ import annotations

import argparse
import os.path as osp

from warpedganspace_tpu.utils.io import load_pt, save_pt


def build_parser():
    parser = argparse.ArgumentParser(
        description="Convert a checkpoint file into a support sets and a reconstructor weights files"
    )
    parser.add_argument("--exp", type=str, required=True,
                        help="set experiment's model dir (created by `train.py`)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if not osp.isdir(args.exp):
        raise NotADirectoryError("Invalid given directory: {}".format(args.exp))
    models_dir = osp.join(args.exp, "models")
    if not osp.isdir(models_dir):
        raise NotADirectoryError("Invalid models directory: {}".format(models_dir))
    checkpoint_file = osp.join(models_dir, "checkpoint.pt")
    if not osp.isfile(checkpoint_file):
        if osp.isdir(osp.join(models_dir, "orbax")):
            return _split_orbax(args.exp, models_dir)
        raise FileNotFoundError("Checkpoint file not found: {}".format(checkpoint_file))

    print("#. Convert checkpoint file into support sets and reconstructor weight files...")
    ckpt = load_pt(checkpoint_file)
    it = ckpt["iter"]
    print("  \\__Checkpoint iteration: {}".format(it))
    print("  \\__Save checkpoint support sets weights file...")
    save_pt(ckpt["support_sets"], osp.join(models_dir, "support_sets-{}.pt".format(it)))
    print("  \\__Save checkpoint reconstructor weights file...")
    save_pt(ckpt["reconstructor"], osp.join(models_dir, "reconstructor-{}.pt".format(it)))


def _split_orbax(exp_dir: str, models_dir: str):
    """Split the newest orbax step (train.py --checkpoint-backend orbax) into
    the same reference-format support_sets-<it>.pt / reconstructor-<it>.pt."""
    import json

    import numpy as np
    import orbax.checkpoint as ocp

    from warpedganspace_tpu.convert import (
        lenet_reconstructor_to_state_dict,
        resnet_reconstructor_to_state_dict,
    )

    with open(osp.join(exp_dir, "args.json")) as f:
        rtype = json.load(f)["reconstructor_type"]
    mgr = ocp.CheckpointManager(osp.abspath(osp.join(models_dir, "orbax")))
    it = mgr.latest_step()
    if it is None:
        raise FileNotFoundError("No completed orbax step under {}".format(models_dir))
    state = mgr.restore(it)
    print("#. Convert orbax checkpoint into support sets and reconstructor weight files...")
    print("  \\__Checkpoint iteration: {}".format(it))
    sp = state["s_params"]
    k = np.asarray(sp["support_sets"]).shape[0]
    print("  \\__Save checkpoint support sets weights file...")
    save_pt(
        {
            "SUPPORT_SETS": np.asarray(sp["support_sets"]).reshape(k, -1),
            "ALPHAS": np.asarray(sp["alphas"]),
            "LOGGAMMA": np.asarray(sp["loggamma"]),
        },
        osp.join(models_dir, "support_sets-{}.pt".format(it)),
    )
    print("  \\__Save checkpoint reconstructor weights file...")
    to_sd = (lenet_reconstructor_to_state_dict if rtype == "LeNet"
             else resnet_reconstructor_to_state_dict)
    save_pt(to_sd(state["r_params"]), osp.join(models_dir, "reconstructor-{}.pt".format(it)))


if __name__ == "__main__":
    main()
