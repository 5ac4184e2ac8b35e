"""Latent-space traversal: scan-compiled path integration + rendering."""

from warpedganspace_tpu.traverse.engine import (
    iter_rendered_u8,
    render_codes,
    traverse_paths,
)
from warpedganspace_tpu.traverse.images import tensor2image, save_jpeg

__all__ = [
    "traverse_paths", "render_codes", "iter_rendered_u8", "tensor2image", "save_jpeg",
]
