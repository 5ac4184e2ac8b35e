"""Training subsystem: jitted contrastive train step + Trainer orchestration."""

from warpedganspace_tpu.train.train_step import TrainStepConfig, make_train_step, init_train_state
from warpedganspace_tpu.train.trainer import Trainer

__all__ = ["TrainStepConfig", "make_train_step", "init_train_state", "Trainer"]
