"""Training subsystem: state, schedules, steps, checkpointing, metrics."""

from pointasnl_tpu.train.schedules import bn_momentum_schedule, staircase_lr_schedule
from pointasnl_tpu.train.state import TrainState, create_train_state
from pointasnl_tpu.train.steps import make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "bn_momentum_schedule",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "staircase_lr_schedule",
]
