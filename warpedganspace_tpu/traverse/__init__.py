"""Latent-space traversal: scan-compiled path integration + rendering."""

from warpedganspace_tpu.traverse.engine import traverse_paths, render_codes
from warpedganspace_tpu.traverse.images import tensor2image, save_jpeg

__all__ = ["traverse_paths", "render_codes", "tensor2image", "save_jpeg"]
