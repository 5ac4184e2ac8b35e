"""Torch-compatible .pt tensor IO.

The reference pipeline's on-disk artifacts (latent_code.pt pools, checkpoint.pt,
support_sets.pt, reconstructor.pt, paths_latent_codes.pt) are torch.save files.
To stay drop-in interoperable — the committed latent pools under
experiments/latent_codes/ ship as .pt, and users may carry reference-trained
models over — we read/write the same format through the CPU torch that is
available in the image. Torch is used strictly at this IO boundary; all compute
is JAX.
"""
from __future__ import annotations

import numpy as np


def _torch():
    import torch

    return torch


def save_pt(obj, path: str) -> None:
    """torch.save ``obj`` with numpy arrays converted to torch tensors.

    Nested dicts/lists/tuples are converted recursively, so reference-style
    state dicts ({name: array}) round-trip as {name: torch.Tensor}.
    """
    torch = _torch()

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(conv(v) for v in x)
        if isinstance(x, np.ndarray):
            return torch.from_numpy(np.array(x, copy=True))
        if hasattr(x, "__array__"):  # jax arrays
            return torch.from_numpy(np.array(np.asarray(x), copy=True))
        return x

    torch.save(conv(obj), path)


def load_pt(path: str):
    """torch.load a .pt file and convert tensors to numpy arrays recursively."""
    torch = _torch()
    obj = torch.load(path, map_location="cpu", weights_only=False)

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(conv(v) for v in x)
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
        return x

    return conv(obj)
