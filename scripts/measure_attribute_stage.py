#!/usr/bin/env python
"""End-to-end attribute-stage throughput (PERFORMANCE.md; VERDICT r2 item 6).

Builds a synthetic K=8-path x T=41-frame 1024^2 traversal tree (JPEG q75, as
the traversal CLI writes), loads all six predictors with randomly initialized
weights through the same converters the parity tests use, and times
``evaluate_hash_dir`` — JPEG decode, resizes, SFD, crops, the five downstream
predictors, and the eval_json/eval_np writes. This is the whole stage as the
CLI runs it, not per-predictor device compute (scripts/measure_evalzoo.py).

The SFD classification biases are pushed negative so the detector returns no
candidates (random weights otherwise fire pathological NMS candidate counts,
drowning the measurement in data-dependent host work); every crop then takes
the reference's no-detection full-frame path, so all downstream stages still
run at full shape.

Run from the repo root (prepend to PYTHONPATH; TPU plugin via sitecustomize).
"""
import os
import os.path as osp
import shutil
import sys
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))  # repo root

T0 = time.perf_counter()
K = 8
T = 41
RES = 1024


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def build_tree(root: str, rng: np.random.RandomState) -> str:
    """Synthetic traversal hash dir: K path dirs of T JPEGs + latent codes."""
    from PIL import Image

    from warpedganspace_tpu.utils.io import save_pt

    h_dir = osp.join(root, "results", "pool", "40_0.15_6.0", "hash0")
    for d in range(K):
        p_dir = osp.join(h_dir, "paths_images", f"path_{d:03d}")
        os.makedirs(p_dir, exist_ok=True)
        # Smooth low-frequency frames: JPEG q75 encodes fast and decodes like
        # real generator output (white noise would inflate decode cost).
        base = rng.rand(RES // 16, RES // 16, 3) * 255
        for t in range(T):
            img = np.asarray(
                Image.fromarray(base.astype(np.uint8)).resize((RES, RES)),
                dtype=np.uint8,
            )
            img = np.clip(img + rng.randint(-8, 8, img.shape), 0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                osp.join(p_dir, f"{t:06d}.jpg"), "JPEG", quality=75,
                optimize=True, progressive=True)
    save_pt(np.zeros((K, T, 128), dtype=np.float32),
            osp.join(h_dir, "paths_latent_codes.pt"))
    return h_dir


def random_predictors():
    """All six predictors from random torch state dicts (parity-test recipe)."""
    import torch

    from tests.reference_utils import import_reference_module, state_dict_numpy

    rng = np.random.RandomState(0)
    torch.manual_seed(0)

    def _randomize_bn(model):
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)

    from warpedganspace_tpu.evalzoo.arcface import IDComparator
    from warpedganspace_tpu.evalzoo.celeba import CelebaAttrPredictor
    from warpedganspace_tpu.evalzoo.fairface import FairFace
    from warpedganspace_tpu.evalzoo.fanau import AUdetector
    from warpedganspace_tpu.evalzoo.hopenet import Hopenet
    from warpedganspace_tpu.evalzoo.sfd import SFDDetector

    s3fd = import_reference_module("lib.evaluation.sfd.net_s3fd").s3fd
    sfd_t = s3fd().eval()
    with torch.no_grad():  # empty detections: see module docstring. The face
        # score is softmax[..., -1] of each conf head, so push the face
        # channel's bias far below the background channels'.
        for name, mod in sfd_t.named_modules():
            if "conf" in name and getattr(mod, "bias", None) is not None:
                mod.bias.fill_(20.0)
                mod.bias[-1] = -20.0
    sfd = SFDDetector.from_state_dict(state_dict_numpy(sfd_t))

    SE_IR = import_reference_module("lib.evaluation.archface.arcface").SE_IR
    arc_t = SE_IR(50, drop_ratio=0.4, mode="ir_se").eval()
    _randomize_bn(arc_t)
    cmp_ = IDComparator.from_state_dict(state_dict_numpy(arc_t), prefix="")

    _celeba = import_reference_module(
        "lib.evaluation.celeba_attributes.celeba_attr_predictor")
    RefHopenet = import_reference_module("lib.evaluation.hopenet.hopenet").Hopenet
    hn_t = RefHopenet(_celeba.Bottleneck, [3, 4, 6, 3], 66).eval()
    _randomize_bn(hn_t)
    hn = Hopenet.from_state_dict(state_dict_numpy(hn_t))

    FANAU = import_reference_module("lib.evaluation.au_detector.hourglass").FANAU
    au_t = FANAU(num_modules=1, n_points=12).eval()
    _randomize_bn(au_t)
    aud = AUdetector.from_state_dict(state_dict_numpy(au_t))

    attr_file = "/root/reference/lib/evaluation/celeba_attributes/attributes_5.json"
    cel_t = _celeba.ResNet(_celeba.Bottleneck, [3, 4, 6, 3], attr_file=attr_file).eval()
    _randomize_bn(cel_t)
    cel = CelebaAttrPredictor.from_state_dict(state_dict_numpy(cel_t), attr_file)

    # FairFace: resnet34 head built from reference blocks (no torchvision).
    from tests.test_attribute_parity import _build_torch_fairface

    ff_t = _build_torch_fairface(torch, _celeba)
    _randomize_bn(ff_t)
    ff = FairFace.from_state_dict(state_dict_numpy(ff_t))

    return {"sfd": sfd, "id": cmp_, "fairface": ff, "hopenet": hn,
            "au": aud, "celeba": cel}


def main():
    from warpedganspace_tpu.cli.traverse_attribute_space import evaluate_hash_dir

    tmp = tempfile.mkdtemp(prefix="wgs_attr_stage_")
    try:
        rng = np.random.RandomState(3)
        log("building synthetic K=8 x T=41 tree...")
        h_dir = build_tree(tmp, rng)
        log("loading random-weight predictors...")
        predictors = random_predictors()

        log("warm run (compiles)...")
        evaluate_hash_dir(h_dir, predictors, gan_type="StyleGAN2")
        n_frames = K * T
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            evaluate_hash_dir(h_dir, predictors, gan_type="StyleGAN2")
            best = max(best, n_frames / (time.perf_counter() - t0))
        log(f"attribute stage e2e (K={K}, T={T}, {RES}^2): {best:.2f} img/s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
