"""Training subsystem: state, jitted steps, epoch driver, checkpointing."""

from asvspoof2021_air_tpu.train.state import TrainState, create_train_state
from asvspoof2021_air_tpu.train.steps import make_eval_step, make_train_step

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]
