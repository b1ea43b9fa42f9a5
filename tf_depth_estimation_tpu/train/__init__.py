"""Training harness: jit train steps, experiment configs, checkpoints, loops."""

from tf_depth_estimation_tpu.train.state import TrainState, create_train_state
from tf_depth_estimation_tpu.train.config import ExperimentConfig

__all__ = ["TrainState", "create_train_state", "ExperimentConfig"]
