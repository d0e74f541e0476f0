"""Fused ball-query Pallas TPU kernel.

Same contract as ops/geometry.py::query_ball_point (mirroring
tf_ops/grouping/tf_grouping_g.cu:3-36): first `nsample` in-ball support
indices in index order, pad-with-first, strict `< radius`, per-query in-ball
count capped at nsample. The jnp path selects the k smallest candidate
indices with lax.top_k — XLA's sort lowering has been measured to dominate
whole train steps on this hardware (BENCH_OPS.md), so like ops/pallas/knn.py
this kernel keeps the (TILE_M, N) distance block in VMEM and extracts the
ascending in-ball indices with min-reductions only (no sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_M = 128
_INF = 3e38  # python float: jnp constants would be captured tracers


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ball_kernel(q_ref, s_ref, s2_ref, idx_ref, cnt_ref, d2_scratch, *,
                 nsample: int, radius2: float, n_real: int):
    # q_ref: (1, TILE_M, 4); s_ref: (1, 4, Np); s2_ref: (1, 1, Np) (+inf pad)
    # idx_ref: (1, TILE_M, Kp) i32; cnt_ref: (1, TILE_M, LANE) i32
    # d2_scratch: (TILE_M, Np) f32 — accumulated one coordinate at a time so
    # only one temporary is live (see the resident kNN kernel's note)
    q = q_ref[0]
    s = s_ref[0]
    npad = s.shape[-1]
    kp = idx_ref.shape[-1]

    # direct differences, the reference's exact formula
    # (tf_grouping_g.cu:24: sqrtf((x2-x1)^2+...) < radius); pads stay +inf
    d2_scratch[:] = jnp.square(q[:, 0:1] - s[0:1, :])
    d2_scratch[:] = d2_scratch[:] + jnp.square(q[:, 1:2] - s[1:2, :])
    d2_scratch[:] = d2_scratch[:] + jnp.square(q[:, 2:3] - s[2:3, :])
    d2 = jnp.where(s2_ref[0] < _INF, d2_scratch[:], _INF)

    lane_ids = lax.broadcasted_iota(jnp.int32, (TILE_M, npad), dimension=1)
    out_lanes = lax.broadcasted_iota(jnp.int32, (TILE_M, kp), dimension=1)

    in_ball = d2 < radius2
    # candidate = its own index when in-ball, else the sentinel npad
    cand = jnp.where(in_ball, lane_ids, jnp.int32(npad))
    cnt = jnp.minimum(
        jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True),
        jnp.int32(nsample),
    )  # (TILE_M, 1)

    def body(j, carry):
        last, first, idxs = carry  # (TM,1) i32, (TM,1) i32, (TM,Kp) i32
        nxt = jnp.min(jnp.where(cand > last, cand, jnp.int32(npad)),
                      axis=1, keepdims=True)  # strictly ascending extraction
        valid = nxt < jnp.int32(n_real)
        first = jnp.where(j == 0, jnp.where(valid, nxt, 0), first)
        slot = jnp.where(valid, nxt, first)  # pad-with-first (empty ball -> 0)
        idxs = jnp.where(out_lanes == j, slot, idxs)
        return jnp.where(valid, nxt, last), first, idxs

    init = (
        jnp.full((TILE_M, 1), -1, jnp.int32),
        jnp.zeros((TILE_M, 1), jnp.int32),
        jnp.zeros((TILE_M, kp), jnp.int32),
    )
    _, _, idxs = lax.fori_loop(0, nsample, body, init)
    idx_ref[0] = idxs
    cnt_ref[0] = jnp.broadcast_to(cnt, cnt_ref.shape[1:])


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array):
    """Pallas ball query: xyz (B,N,3), new_xyz (B,M,3) -> (idx, cnt)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    xyz = lax.stop_gradient(xyz.astype(jnp.float32))
    new_xyz = lax.stop_gradient(new_xyz.astype(jnp.float32))

    npad = _round_up(N, LANE)
    mpad = _round_up(M, TILE_M)
    kp = _round_up(nsample, LANE)

    s = jnp.swapaxes(xyz, 1, 2)
    s = jnp.pad(s, ((0, 0), (0, 1), (0, npad - N)))
    s2 = jnp.sum(s * s, axis=1, keepdims=True)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, npad), dimension=2)
    s2 = jnp.where(lane < N, s2, _INF)
    q = jnp.pad(new_xyz, ((0, 0), (0, mpad - M), (0, 1)))

    kernel = functools.partial(
        _ball_kernel, nsample=nsample, radius2=float(radius) ** 2, n_real=N
    )
    idx, cnt = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, 4), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, npad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, kp), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, LANE), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, kp), jnp.int32),
            jax.ShapeDtypeStruct((B, mpad, LANE), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((TILE_M, npad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=B * mpad * npad * (8 + 3 * nsample),
            bytes_accessed=B * (mpad * 4 + 4 * npad + mpad * (kp + LANE)) * 4,
            transcendentals=0,
        ),
    )(q, s, s2)
    return idx[:, :M, :nsample], cnt[:, :M, 0]
