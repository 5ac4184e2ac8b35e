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
        raise FileNotFoundError("Checkpoint file not found: {}".format(checkpoint_file))

    print("#. Convert checkpoint file into support sets and reconstructor weight files...")
    ckpt = load_pt(checkpoint_file)
    it = ckpt["iter"]
    print("  \\__Checkpoint iteration: {}".format(it))
    print("  \\__Save checkpoint support sets weights file...")
    save_pt(ckpt["support_sets"], osp.join(models_dir, "support_sets-{}.pt".format(it)))
    print("  \\__Save checkpoint reconstructor weights file...")
    save_pt(ckpt["reconstructor"], osp.join(models_dir, "reconstructor-{}.pt".format(it)))


if __name__ == "__main__":
    main()
