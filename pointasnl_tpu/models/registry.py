"""Name -> model-class registry (driver-facing model selection).

Mirrors the reference's dynamic `importlib.import_module(FLAGS.model)`
(train.py:57) with an explicit registry keyed by the same model names.
"""

from __future__ import annotations

from typing import Dict

MODEL_REGISTRY: Dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
