"""Training subsystem: state, jitted steps, epoch driver, checkpointing."""

from asvspoof2021_air_tpu.train.state import TrainState, create_train_state
from asvspoof2021_air_tpu.train.steps import make_eval_step, make_train_step
from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend
from asvspoof2021_air_tpu.train.loop import TrainConfig, train
from asvspoof2021_air_tpu.train.ensemble import (
    fuse_scores,
    init_ensemble_state,
    make_ensemble_eval_step,
    make_ensemble_train_step,
    make_member_parallel_step,
)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "OnDeviceFrontend", "TrainConfig", "train",
           "init_ensemble_state", "make_ensemble_train_step",
           "make_ensemble_eval_step", "make_member_parallel_step",
           "fuse_scores"]
