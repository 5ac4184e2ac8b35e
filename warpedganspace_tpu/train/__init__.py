"""Training subsystem: jitted contrastive train step + Trainer orchestration."""

from warpedganspace_tpu.train.train_step import (
    TrainStepConfig,
    init_train_state,
    make_train_step,
    make_train_step_scan,
)
from warpedganspace_tpu.train.trainer import Trainer

__all__ = ["TrainStepConfig", "make_train_step", "make_train_step_scan",
           "init_train_state", "Trainer"]
