"""Checkpoint / resume: orbax pytree checkpoints with best/latest aliases.

TPU-native replacement for tf.train.Saver's latest/best scheme
(train.py:190-205): the whole TrainState pytree {step, params, batch_stats,
opt_state} round-trips; LR/BN schedules are pure functions of step so resume
restores them implicitly (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _path(ckpt_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), name)


def save_checkpoint(state: Any, ckpt_dir: str, name: str = "latest") -> str:
    """Save the array-leaf portion of a TrainState (tx/apply_fn are static)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path = _path(ckpt_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def restore_checkpoint(state: Any, ckpt_dir: str, name: str = "latest"):
    """Restore into the structure of `state` (shapes/dtypes must match)."""
    target = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    path = _path(ckpt_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def checkpoint_exists(ckpt_dir: str, name: str = "latest") -> bool:
    return os.path.isdir(_path(ckpt_dir, name))
