"""Helpers for loading the read-only reference PyTorch implementation in tests.

The reference at /root/reference is used purely as a *golden oracle*: its
randomly-initialized torch modules are run forward, their state dicts are pulled
through our converters, and our JAX models must reproduce the outputs. No
pretrained weights are needed (the image has no network access).
"""
import os.path as osp
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return osp.isdir(osp.join(REFERENCE_ROOT, "models"))


def add_reference_to_path():
    if not reference_available():
        pytest.skip("reference implementation not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def torch_or_skip():
    return pytest.importorskip("torch")


def import_reference_module(dotted: str):
    """Import a leaf module under /root/reference WITHOUT executing package
    __init__ files (lib/__init__.py imports torchvision, sfd/core.py imports
    skimage — neither is installed). Ancestor packages are stubbed with bare
    module objects carrying only __path__.
    """
    import importlib
    import types

    add_reference_to_path()
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [osp.join(REFERENCE_ROOT, *parts[:i])]
            sys.modules[pkg] = mod
    return importlib.import_module(dotted)


def state_dict_numpy(module) -> dict:
    """Torch module state_dict -> plain numpy dict."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
