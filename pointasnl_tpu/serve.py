"""Serving export: self-contained, ahead-of-time-lowered inference artifacts.

The reference's deployment story was "clone the repo, rebuild the TF graph,
restore a Saver checkpoint" — the model could not leave Python+TF. Here the
jitted inference function (weights baked in as constants) exports to a
serialized StableHLO artifact via `jax.export`: a single file a serving
process can load and call with zero model code, compiled by whatever XLA
runtime it lands on.

Artifacts are single-platform (the Pallas geometry kernels lower per
backend — ops/dispatch.py picks jnp vs Pallas at trace time), and
fixed-shape (batch, num_point are baked; export several batch sizes for a
bucketed server). The `.jaxexp` file layout is a 8-byte length-prefixed
JSON header (model metadata) followed by the serialized export.

Usage:
    # export (from a trained log dir, on the target platform):
    python -m pointasnl_tpu.cli.export_model \
        --model_path log/scannet --ckpt best --batch_size 1 --out model.jaxexp

    # serve:
    from pointasnl_tpu.serve import load_exported
    art = load_exported("model.jaxexp")
    logits = art(points)  # (B, N, num_class) / (B, num_class)
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"PASNLX1\n"


def make_inference_fn(model, variables) -> Callable:
    """The canonical serving forward: eval mode, fixed BN stats, no dropout."""

    def infer(points):
        logits, _ = model.apply(
            variables, points, training=False, bn_momentum=0.9
        )
        return logits

    return infer


def export_model(
    model,
    variables,
    batch_size: int,
    num_point: int,
    feature_channel: int = 0,
    metadata: Optional[Dict[str, Any]] = None,
) -> bytes:
    """Serialize the jitted inference function with weights baked in."""
    infer = jax.jit(make_inference_fn(model, variables))
    spec = jax.ShapeDtypeStruct(
        (batch_size, num_point, 3 + feature_channel), jnp.float32
    )
    exported = jax_export.export(infer)(spec)
    header = dict(
        metadata or {},
        batch_size=batch_size,
        num_point=num_point,
        feature_channel=feature_channel,
        platforms=list(exported.platforms),
        jax_version=jax.__version__,
    )
    hbytes = json.dumps(header).encode()
    return _MAGIC + struct.pack("<Q", len(hbytes)) + hbytes + exported.serialize()


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


class ExportedModel:
    """A loaded serving artifact: metadata + zero-model-code callable."""

    def __init__(self, header: Dict[str, Any], exported):
        self.header = header
        self._exported = exported

    def __call__(self, points):
        return self._exported.call(points)


def load_exported(path: str) -> ExportedModel:
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path} is not a pointasnl export artifact")
    off = len(_MAGIC)
    (hlen,) = struct.unpack_from("<Q", blob, off)
    off += 8
    header = json.loads(blob[off : off + hlen].decode())
    exported = jax_export.deserialize(blob[off + hlen :])
    return ExportedModel(header, exported)
