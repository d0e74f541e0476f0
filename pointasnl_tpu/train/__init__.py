"""Training subsystem: state, schedules, steps, checkpointing, metrics."""

from pointasnl_tpu.train.checkpoint import (
    CheckpointManager,
    checkpoint_exists,
    list_epochs,
    restore_checkpoint,
    save_checkpoint,
)
from pointasnl_tpu.train.metrics import IoU_from_confusions, IouEval, JaxIouEval
from pointasnl_tpu.train.schedules import bn_momentum_schedule, staircase_lr_schedule
from pointasnl_tpu.train.state import TrainState, create_train_state, make_optimizer
from pointasnl_tpu.train.steps import make_eval_step, make_predict_step, make_train_step

__all__ = [
    "CheckpointManager",
    "IoU_from_confusions",
    "IouEval",
    "JaxIouEval",
    "TrainState",
    "bn_momentum_schedule",
    "checkpoint_exists",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_predict_step",
    "make_train_step",
    "list_epochs",
    "restore_checkpoint",
    "save_checkpoint",
    "staircase_lr_schedule",
]
