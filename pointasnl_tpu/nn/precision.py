"""Compute-dtype policy (mixed precision).

One switch controls the compute dtype of every PointConv/FullyConnected in
the model (parameters stay float32; BatchNorm statistics are always reduced
in float32; losses upcast logits to float32). bfloat16 halves activation HBM
traffic and engages the MXU's native bf16 path.

Usage (must be in effect while the train step is TRACED, i.e. set before the
first jitted call — it is a static tracing-time property):

    from pointasnl_tpu.nn import precision
    precision.set_compute_dtype("bfloat16")       # process-wide
    with precision.compute_dtype("bfloat16"):      # or scoped
        state, metrics = train_step(...)

Env default: POINTASNL_COMPUTE_DTYPE={float32,bfloat16}.
"""

from __future__ import annotations

import contextlib
import os
import threading


import jax.numpy as jnp

_NAMES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}

_state = threading.local()


def _resolve(dtype):
    if dtype is None:
        return None
    if isinstance(dtype, str):
        return _NAMES[dtype]
    return dtype


def set_compute_dtype(dtype) -> None:
    """Set the process-wide compute dtype (None = float32 default)."""
    _state.dtype = _resolve(dtype)


def current_compute_dtype():
    """The active compute dtype, or None (float32 semantics)."""
    explicit = getattr(_state, "dtype", None)
    if explicit is not None:
        return explicit
    env = os.environ.get("POINTASNL_COMPUTE_DTYPE")
    if env and env in _NAMES and _NAMES[env] is not jnp.float32:
        return _NAMES[env]
    return None


@contextlib.contextmanager
def compute_dtype(dtype):
    """Scoped compute-dtype override (must cover trace time)."""
    prev = getattr(_state, "dtype", None)
    _state.dtype = _resolve(dtype)
    try:
        yield
    finally:
        _state.dtype = prev
