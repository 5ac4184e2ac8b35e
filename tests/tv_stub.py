"""Functional stub of the torchvision pieces the reference's executable
scripts use (torchvision is NOT installed on this image).

These are re-implementations of PUBLIC-LIBRARY semantics only — no reference
code. Era: torchvision ~0.8-0.11, the versions the reference targets
(requirements point at the torchvision of the torch-1.x line):

- ``transforms``: Compose / Resize / CenterCrop / Normalize / ToPILImage with
  tensor-input semantics — bilinear ``F.interpolate`` with
  ``align_corners=False`` and no antialias, long side =
  ``int(size * long / short)``, pad-then-crop CenterCrop. These are the exact
  era semantics already validated numerically by
  tests/test_attribute_parity.py's transcription.
- ``models``: ``resnet34`` (BasicBlock, [3, 4, 6, 3], torchvision parameter
  key layout — the reference loads the FairFace checkpoint into it strict,
  traverse_attribute_space.py:179-184) and ``models.resnet.Bottleneck`` /
  ``BasicBlock`` (the block classes the reference's Hopenet is constructed
  with, traverse_attribute_space.py:190).

``install()`` registers the stub under ``sys.modules['torchvision']`` so
reference scripts executed via runpy import it transparently. Import order
matters only in that install() must run before the reference script's
``import torchvision``.
"""
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# transforms (tensor-input era semantics)
# ---------------------------------------------------------------------------

def _resize_tensor(img, size):
    """torchvision functional resize, int-size overload: short side -> size,
    long side scaled by int(size * long / short); no-op if already there."""
    h, w = img.shape[-2:]
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        ow, oh = size, int(size * h / w)
    else:
        oh, ow = size, int(size * w / h)
    squeeze = img.dim() == 3
    if squeeze:
        img = img.unsqueeze(0)
    out = F.interpolate(img, size=(oh, ow), mode="bilinear", align_corners=False)
    return out.squeeze(0) if squeeze else out


def _center_crop_tensor(img, size):
    """torchvision functional center_crop: pad (left-biased) when the image is
    smaller than the crop, then round-half-up top-left corner."""
    h, w = img.shape[-2:]
    if size > h or size > w:
        pl = (size - w) // 2 if size > w else 0
        pr = (size - w + 1) // 2 if size > w else 0
        pt = (size - h) // 2 if size > h else 0
        pb = (size - h + 1) // 2 if size > h else 0
        img = F.pad(img, (pl, pr, pt, pb))
        h, w = img.shape[-2:]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img[..., top:top + size, left:left + size]


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        return _resize_tensor(img, self.size)


class CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        return _center_crop_tensor(img, self.size)


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32)
        self.std = torch.tensor(std, dtype=torch.float32)

    def __call__(self, img):
        shape = (-1, 1, 1) if img.dim() == 3 else (1, -1, 1, 1)
        return (img - self.mean.view(shape)) / self.std.view(shape)


class ToPILImage:
    """uint8 CHW tensor -> PIL image (the only call pattern in the
    reference's tensor2image, traverse_latent_space.py:26-41)."""

    def __call__(self, pic):
        from PIL import Image

        arr = pic.detach().cpu().numpy()
        if arr.ndim == 3:
            arr = np.transpose(arr, (1, 2, 0))
            if arr.shape[2] == 1:
                arr = arr[:, :, 0]
        return Image.fromarray(arr)


# ---------------------------------------------------------------------------
# models.resnet (torchvision parameter key layout)
# ---------------------------------------------------------------------------

def _conv3x3(inp, out, stride=1):
    return nn.Conv2d(inp, out, kernel_size=3, stride=stride, padding=1, bias=False)


def _conv1x1(inp, out, stride=1):
    return nn.Conv2d(inp, out, kernel_size=1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def resnet34(pretrained=False, **kwargs):
    """torchvision.models.resnet34. ``pretrained`` is accepted and ignored:
    the reference immediately overwrites every parameter via a strict
    load_state_dict of the FairFace checkpoint
    (traverse_attribute_space.py:182-184), so the ImageNet download is dead
    weight even upstream."""
    return ResNet(BasicBlock, [3, 4, 6, 3], **kwargs)


def resnet18(*args, **kwargs):
    raise RuntimeError("torchvision stub: resnet18 is not needed by the "
                       "reference's evaluation scripts")


def install():
    """Register the stub as ``torchvision`` in sys.modules."""
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvr = types.ModuleType("torchvision.models.resnet")
    tvt = types.ModuleType("torchvision.transforms")

    tvr.BasicBlock, tvr.Bottleneck = BasicBlock, Bottleneck
    tvm.resnet = tvr
    tvm.resnet34, tvm.resnet18 = resnet34, resnet18
    for name in ("Compose", "Resize", "CenterCrop", "Normalize", "ToPILImage"):
        setattr(tvt, name, globals()[name])

    tv.models, tv.transforms = tvm, tvt
    sys.modules.update({
        "torchvision": tv,
        "torchvision.models": tvm,
        "torchvision.models.resnet": tvr,
        "torchvision.transforms": tvt,
    })
    return tv
