"""MXU-friendly scatter-add: the gather VJPs as chunked one-hot matmuls.

XLA lowers the VJP of take_along_axis to scatter-add, which TPUs execute
(effectively) serially: measured in isolation at the seg model's shapes
(scripts/bench_scatter_vjp.py, v5e, 2026-08-17):

    layer0_self (MK=327680, N=10240, C=6):  scatter 411.6 ms | one-hot 12.8 ms
    layer1      (MK=40960,  N=10240, C=35): scatter 466.3 ms | one-hot  5.5 ms
    layer1 C=64:                            scatter 109.9 ms | one-hot  4.3 ms

The one-hot form computes dPoints = onehot(idx)^T @ dOut in MK-chunks via
lax.scan — 2*B*MK*N*C MXU FLOPs, no scatter anywhere. The reference's CUDA
equivalent was an atomicAdd kernel (tf_grouping_g.cu:60-78); this is the
TPU-native replacement (systolic array instead of atomics).

Numerics: the one-hot operand is exact in any precision; the default TPU
matmul rounds the dOut operand through bf16 (~1e-3 relative on the
gradients). `precision` defaults to HIGHEST (3-pass f32 emulation) so the
gradients match the scatter path to f32 round-off — measured still >>10x
faster than the scatter (see BENCH_OPS.md).

`gather_point_mxu` / `group_point_mxu` are drop-in replacements for the
geometry gathers with this backward; ops.dispatch selects them on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from pointasnl_tpu.ops import geometry as _g

_CHUNK = 2048


def onehot_scatter_add(dout, idx, n: int, *, chunk: int = _CHUNK,
                       precision=lax.Precision.HIGHEST):
    """Sum dout rows into their idx bins: (B, MK, C), (B, MK) -> (B, N, C).

    Equivalent to `zeros(B, N, C).at[b, idx].add(dout)` but computed as
    one-hot matmuls on the MXU, streamed over MK chunks of `chunk` rows so
    the (chunk, N) one-hot block never exceeds a few MB.
    """
    B, MK, C = dout.shape
    pad = (-MK) % chunk
    if pad:
        dout = jnp.pad(dout, ((0, 0), (0, pad), (0, 0)))
        # out-of-range index -> matches no support row -> contributes zero
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=n)
    nchunk = (MK + pad) // chunk
    dc = dout.reshape(B, nchunk, chunk, C).swapaxes(0, 1)
    ic = idx.reshape(B, nchunk, chunk).swapaxes(0, 1)
    iota = jnp.arange(n, dtype=idx.dtype)

    def body(acc, args):
        dci, ici = args
        oh = (ici[..., None] == iota).astype(dout.dtype)  # (B, chunk, N)
        return acc + jnp.einsum(
            "bkn,bkc->bnc", oh, dci, precision=precision
        ), None

    acc0 = jnp.zeros((B, n, C), dout.dtype)
    out, _ = lax.scan(body, acc0, (dc, ic))
    return out


@jax.custom_vjp
def gather_point_mxu(points, idx):
    return _g.gather_point(points, idx)


def _gp_fwd(points, idx):
    return _g.gather_point(points, idx), (idx, points.shape[1])


def _gp_bwd(res, dout):
    idx, n = res
    return onehot_scatter_add(dout, idx, n), None


gather_point_mxu.defvjp(_gp_fwd, _gp_bwd)
gather_point_mxu.__doc__ = (_g.gather_point.__doc__ or "") + (
    "\n\nTPU variant: the scatter-add gradient runs as chunked one-hot "
    "matmuls on the MXU (ops/scatter.py)."
)


@jax.custom_vjp
def group_point_mxu(points, idx):
    return _g.group_point(points, idx)


def _grp_fwd(points, idx):
    return _g.group_point(points, idx), (idx, points.shape[1])


def _grp_bwd(res, dout):
    idx, n = res
    B, M, K, C = dout.shape
    return (
        onehot_scatter_add(dout.reshape(B, M * K, C), idx.reshape(B, M * K), n),
        None,
    )


group_point_mxu.defvjp(_grp_fwd, _grp_bwd)
group_point_mxu.__doc__ = (_g.group_point.__doc__ or "") + (
    "\n\nTPU variant: the scatter-add gradient runs as chunked one-hot "
    "matmuls on the MXU (ops/scatter.py)."
)
