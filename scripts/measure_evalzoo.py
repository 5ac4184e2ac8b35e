#!/usr/bin/env python
"""Attribute-evaluation zoo throughput on the local chip (PERFORMANCE.md).

Times each of the six predictors at the attribute-stage batch shape (one whole
traversal path, T = 2*25+1 = 41 frames, largest reference eval config) with
randomly initialized weights pulled through the same converters the parity
tests use. SFD is split into its jitted tower (device) and the host-side
anchor-decode/NMS, which is data-dependent (random weights fire pathological
candidate counts, so only the tower number is meaningful here).

Inputs are staged on device first: these are compute numbers. On this dev
harness the axon tunnel moves ~20 MB/s host<->device, so a (41, 256, 256, 3)
f32 batch costs ~500 ms to upload — on a production TPU host (local PCIe)
staging is negligible next to the 6-33 ms compute below.

Run from the repo root (prepend to PYTHONPATH; the TPU plugin registers via
sitecustomize).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))  # repo root
from tests.reference_utils import import_reference_module, state_dict_numpy  # noqa: E402

T0 = time.perf_counter()
B = 41  # one whole traversal path at the biggest reference eval config


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def timed(fn, *args, reps=10, rounds=3):
    out = fn(*args)
    float(np.sum(np.asarray(jax.tree_util.tree_leaves(out)[0])))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.sum(np.asarray(jax.tree_util.tree_leaves(out)[0])))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _randomize_bn(torch, model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)


import torch  # noqa: E402

rng = np.random.RandomState(0)

# ---------------- SFD (jitted tower; host NMS excluded — data-dependent) ----
s3fd = import_reference_module("lib.evaluation.sfd.net_s3fd").s3fd
torch.manual_seed(0)
ref = s3fd().eval()
from warpedganspace_tpu.evalzoo.sfd import SFDDetector  # noqa: E402

det = SFDDetector.from_state_dict(state_dict_numpy(ref))
imgs256 = rng.rand(B, 256, 256, 3).astype(np.float32) * 255.0
x = jnp.asarray(imgs256)
t = timed(lambda x: det._apply(det.params, x), x)
log(f"SFD tower (256², B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} img/s")

# ---------------- ArcFace IDComparator --------------------------------------
SE_IR = import_reference_module("lib.evaluation.archface.arcface").SE_IR
torch.manual_seed(0)
ref = SE_IR(50, drop_ratio=0.4, mode="ir_se").eval()
_randomize_bn(torch, ref)
from warpedganspace_tpu.evalzoo.arcface import IDComparator  # noqa: E402

cmp_ = IDComparator.from_state_dict(state_dict_numpy(ref), prefix="")
xa = jnp.asarray(rng.rand(B, 256, 256, 3).astype(np.float32))
xb = jnp.asarray(rng.rand(B, 256, 256, 3).astype(np.float32))
t = timed(lambda a, b: cmp_(a, b), xa, xb)
log(f"ArcFace ID (pairs,  B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} pairs/s")

# ---------------- Hopenet ----------------------------------------------------
RefHopenet = import_reference_module("lib.evaluation.hopenet.hopenet").Hopenet
Bottleneck = import_reference_module(
    "lib.evaluation.celeba_attributes.celeba_attr_predictor").Bottleneck
torch.manual_seed(0)
ref = RefHopenet(Bottleneck, [3, 4, 6, 3], 66).eval()
_randomize_bn(torch, ref)
from warpedganspace_tpu.evalzoo.hopenet import Hopenet  # noqa: E402

hn = Hopenet.from_state_dict(state_dict_numpy(ref))
x224 = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
t = timed(lambda x: hn(x), x224)
log(f"Hopenet   (224², B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} img/s")

# ---------------- FAN-AU -----------------------------------------------------
FANAU = import_reference_module("lib.evaluation.au_detector.hourglass").FANAU
torch.manual_seed(0)
ref = FANAU(num_modules=1, n_points=12).eval()
_randomize_bn(torch, ref)
from warpedganspace_tpu.evalzoo.fanau import AUdetector  # noqa: E402

aud = AUdetector.from_state_dict(state_dict_numpy(ref))
imgs = jnp.asarray(rng.rand(B, 256, 256, 3).astype(np.float32) * 255.0)
t = timed(lambda x: aud.detect_AU(x), imgs)
log(f"FAN-AU    (256², B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} img/s")

# ---------------- CelebA-5 ---------------------------------------------------
_celeba = import_reference_module("lib.evaluation.celeba_attributes.celeba_attr_predictor")
attr_file = "/root/reference/lib/evaluation/celeba_attributes/attributes_5.json"
torch.manual_seed(0)
ref = _celeba.ResNet(_celeba.Bottleneck, [3, 4, 6, 3], attr_file=attr_file).eval()
_randomize_bn(torch, ref)
from warpedganspace_tpu.evalzoo.celeba import CelebaAttrPredictor  # noqa: E402

pred = CelebaAttrPredictor.from_state_dict(state_dict_numpy(ref), attr_file)
t = timed(lambda x: pred(x), x224)
log(f"CelebA-5  (224², B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} img/s")

# ---------------- FairFace (torchvision-named resnet34-18; tv not installed,
# so build it from the reference blocks, as the parity test does) ------------
BasicBlock, conv1x1 = _celeba.BasicBlock, _celeba.conv1x1
nn_t = torch.nn


class TorchResNet34(nn_t.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn_t.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn_t.BatchNorm2d(64)
        self.relu = nn_t.ReLU()
        self.maxpool = nn_t.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(BasicBlock, 64, 3)
        self.layer2 = self._make(BasicBlock, 128, 4, 2)
        self.layer3 = self._make(BasicBlock, 256, 6, 2)
        self.layer4 = self._make(BasicBlock, 512, 3, 2)
        self.avgpool = nn_t.AdaptiveAvgPool2d((1, 1))
        self.fc = nn_t.Linear(512, 18)

    def _make(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn_t.Sequential(
                conv1x1(self.inplanes, planes, stride), nn_t.BatchNorm2d(planes))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [block(planes, planes) for _ in range(1, blocks)]
        return nn_t.Sequential(*layers)


torch.manual_seed(0)
tv = TorchResNet34().eval()
_randomize_bn(torch, tv)
from warpedganspace_tpu.evalzoo.fairface import FairFace  # noqa: E402

ff = FairFace.from_state_dict(state_dict_numpy(tv))
t = timed(lambda x: ff(x), x224)
log(f"FairFace  (224², B={B}): {t * 1e3:6.1f} ms -> {B / t:7.1f} img/s")
