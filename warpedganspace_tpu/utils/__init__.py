"""Utilities: experiment directory schema, terminal progress, image/GIF IO."""

from warpedganspace_tpu.utils.aux import (
    create_exp_dir,
    sec2dhms,
    update_progress,
    update_stdout,
    create_summarizing_gif,
)

__all__ = [
    "create_exp_dir",
    "sec2dhms",
    "update_progress",
    "update_stdout",
    "create_summarizing_gif",
]
