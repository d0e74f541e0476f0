"""Config persistence: the args.txt JSON round-trip.

The reference persists train-time argparse flags as JSON (`args.txt`,
ScanNet/train_scannet_grid.py:94-95) and the testers reload them to
reconstruct the model (test_scannet_grid.py:37-39). Same contract here.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Union


def save_args(args: Union[argparse.Namespace, Dict[str, Any]], log_dir: str, name: str = "args.txt") -> str:
    d = vars(args) if isinstance(args, argparse.Namespace) else dict(args)
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, name)
    with open(path, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)
    return path


def load_args(log_dir: str, name: str = "args.txt") -> Dict[str, Any]:
    with open(os.path.join(log_dir, name)) as f:
        return json.load(f)


def snapshot_sources(log_dir: str, model_name: str, extra_modules=()) -> str:
    """Copy the run's defining source files into the log dir.

    Parity with the reference's log-dir code backup (train.py:67-70: the
    model file + the trainer are cp'd next to the logs so a checkpoint can
    always be rebuilt against the exact code that produced it). Copies the
    model's module file, the core layer library, and any `extra_modules`
    (module objects or file paths) into `<log_dir>/src_snapshot/`.
    """
    import importlib
    import shutil

    dst = os.path.join(log_dir, "src_snapshot")
    os.makedirs(dst, exist_ok=True)
    files = []
    try:
        mod = importlib.import_module(f"pointasnl_tpu.models.{_model_module(model_name)}")
        files.append(mod.__file__)
    except Exception:
        pass
    for m in ("pointasnl_tpu.nn.pointasnl", "pointasnl_tpu.nn.layers"):
        files.append(importlib.import_module(m).__file__)
    for extra in extra_modules:
        files.append(extra if isinstance(extra, str) else extra.__file__)
    for f in files:
        if f and os.path.isfile(f):
            shutil.copy2(f, os.path.join(dst, os.path.basename(f)))
    return dst


def _model_module(model_name: str) -> str:
    """Map a reference model name to its module file in models/."""
    return {
        "pointasnl_cls": "cls",
        "pointasnl_sem_seg": "sem_seg",
        "pointasnl_sem_seg_res": "sem_seg_res",
    }.get(model_name, model_name)
