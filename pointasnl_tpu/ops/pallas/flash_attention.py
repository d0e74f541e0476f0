"""Flash-style fused attention Pallas kernels for the non-local cell.

The PointNonLocalCell attention map (M x ndataset) is the model's only
quadratic object (utils/pointasnl_util.py:199). XLA materializes it in HBM
twice per layer (scores out of the QK matmul, probabilities into the PV
matmul). These kernels compute softmax(QK^T/sqrt(C)) V per (batch, M-tile)
grid step entirely in VMEM: scores and probabilities never touch HBM, in
either direction.

Shapes: q (B, M, C), k (B, N, C), v (B, N, D) -> (B, M, D); single head, no
mask (the cell attends over all input points). K/V for one cloud fit VMEM at
every workload size (N <= ~10k, C <= 64 -> ~2.6 MB), so the kernels hold them
resident and tile only M.

Backward (hand-written, VERDICT r1 item 5): the forward stores per-row
logsumexp stats; the backward recomputes normalized probabilities per M-tile
(p = exp(s - L), rows sum to 1), forms dS = p * (dO V^T - rowsum(dO*O)) on
chip, and emits dQ per tile while accumulating dK/dV into output blocks that
every M-tile of a batch revisits (TPU grid steps are sequential, so the
accumulation is race-free). Zero-padded dO rows contribute exactly zero, so
M-padding needs no masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, stats_ref, *, scale: float):
    # q_ref: (1, TM, C); k_ref: (1, N, C); v_ref: (1, N, D);
    # o_ref: (1, TM, D); stats_ref: (1, TM, LANE) logsumexp broadcast
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TM, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)
    stats_ref[0] = jnp.broadcast_to(m + jnp.log(l), stats_ref.shape[1:]).astype(
        stats_ref.dtype
    )


def _flash_forward_with_stats(q, k, v, scale: float):
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    mpad = _round_up(M, TILE_M)
    if mpad != M:
        q = jnp.pad(q, ((0, 0), (0, mpad - M), (0, 0)))

    kernel = functools.partial(_flash_fwd_kernel, scale=scale)
    out, stats = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, LANE), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, D), q.dtype),
            jax.ShapeDtypeStruct((B, mpad, LANE), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * mpad * N * (C + D),
            bytes_accessed=B * (mpad * C + N * (C + D) + mpad * D) * 4,
            transcendentals=B * mpad * N,
        ),
    )(q, k, v)
    return out, stats  # out (B, mpad, D), stats (B, mpad, LANE)


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, stats_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float
):
    mt = pl.program_id(1)

    q = q_ref[0]          # (TM, C)
    k = k_ref[0]          # (N, C)
    v = v_ref[0]          # (N, D)
    do = do_ref[0]        # (TM, D)
    o = o_ref[0]          # (TM, D)
    L = stats_ref[0][:, :1]  # (TM, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.exp(s - L)  # (TM, N), rows sum to 1 (normalized by construction)

    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (TM, 1)
    dov = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, N)
    ds = p * (dov - delta) * scale  # (TM, N)

    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    dk_tile = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, C)
    dv_tile = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, D)

    # dk/dv blocks are revisited by every M-tile of this batch: init at the
    # first tile, accumulate afterwards (grid steps run sequentially on TPU).
    @pl.when(mt == 0)
    def _():
        dk_ref[0] = dk_tile.astype(dk_ref.dtype)
        dv_ref[0] = dv_tile.astype(dv_ref.dtype)

    @pl.when(mt != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_tile.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_tile.astype(dv_ref.dtype)


def _flash_backward(q, k, v, o_pad, stats, do, scale: float):
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    mpad = o_pad.shape[1]
    if mpad != M:
        q = jnp.pad(q, ((0, 0), (0, mpad - M), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, mpad - M), (0, 0)))  # zero rows -> zero grads

    kernel = functools.partial(_flash_bwd_kernel, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, LANE), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, C), k.dtype),
            jax.ShapeDtypeStruct((B, N, D), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * mpad * N * (C + D),
            bytes_accessed=B * (2 * mpad * (C + 2 * D) + 2 * N * (C + D)) * 4,
            transcendentals=B * mpad * N,
        ),
    )(q, k, v, do, o_pad, stats)
    return dq[:, :M, :], dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scaled: bool = True):
    """Fused softmax(q k^T [/ sqrt(C)]) v. q (B,M,C), k (B,N,C), v (B,N,D)."""
    import math

    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    out, _ = _flash_forward_with_stats(q, k, v, scale)
    return out[:, : q.shape[1], :]


def _fwd(q, k, v, scaled):
    import math

    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    out, stats = _flash_forward_with_stats(q, k, v, scale)
    return out[:, : q.shape[1], :], (q, k, v, out, stats)


def _bwd(scaled, res, ct):
    import math

    q, k, v, o_pad, stats = res
    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    return _flash_backward(q, k, v, o_pad, stats, ct, scale)


flash_attention.defvjp(_fwd, _bwd)
