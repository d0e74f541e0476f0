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
