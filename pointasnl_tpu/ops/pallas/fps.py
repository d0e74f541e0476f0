"""Fused farthest-point-sampling Pallas TPU kernel.

The jnp reference implementation (ops/geometry.py) expresses FPS as a
lax.fori_loop of (distance, min, argmax) over HBM-resident arrays — npoint
sequential XLA loop iterations, each touching (B, N) in HBM. This kernel runs
the ENTIRE loop on-chip: the (B, 3, N) points and the (B, N) running
min-distance live in VMEM/vregs, so each of the npoint iterations is a
handful of VPU ops + one lane-reduction with zero HBM traffic.

Semantics match tf_ops/sampling/tf_sampling_g.cu:105-170 (and the jnp oracle):
first index 0, then argmax of the running min squared distance.

Layout notes:
  - points arrive as (B, 3, Np) with Np padded to a lane multiple (128);
    padded lanes get min_dist = -1 so they can never win the argmax;
  - clouds are processed SUBLANE_TILE (8) at a time per grid step, so the
    sequential npoint recursion is vectorized across the batch on sublanes
    (the r1 kernel ran one cloud per grid step on a single sublane — 1/8 VPU
    utilization and B-way serialization);
  - the previous pick's coordinates are extracted with a one-hot
    multiply-reduce (dynamic scalar loads from the lane dim are not
    VPU-friendly), and the output indices are accumulated in a loop-carried
    one-hot-updated matrix (Mosaic requires lane-aligned vector stores, so we
    write the whole index block once at the end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE_TILE = 8  # clouds processed concurrently on sublanes per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, idx_ref, *, npoint: int, n_real: int):
    # x_ref: (BT, 3, Np) f32 ; idx_ref: (BT, Mp) i32
    xyz = x_ref[:]  # (BT, 3, Np)
    bt, _, npad = xyz.shape
    mpad = idx_ref.shape[-1]

    lane_ids = lax.broadcasted_iota(jnp.int32, (bt, npad), dimension=1)
    valid = lane_ids < n_real
    out_lane_ids = lax.broadcasted_iota(jnp.int32, (bt, mpad), dimension=1)

    min_dist0 = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    idxs0 = jnp.zeros((bt, mpad), jnp.int32)  # slot 0 = first pick = index 0

    def body(j, carry):
        last, min_dist, idxs = carry  # (BT,1) i32, (BT,Np) f32, (BT,Mp) i32
        onehot = (lane_ids == last).astype(jnp.float32)  # (BT, Np)
        p = jnp.sum(xyz * onehot[:, None, :], axis=2)  # (BT, 3)
        diff = xyz - p[:, :, None]
        d = jnp.sum(diff * diff, axis=1)  # (BT, Np)
        min_dist = jnp.minimum(min_dist, d)
        # argmax as max + first-matching-lane (Mosaic's argmax lowering
        # fails at some shapes; this uses only max/min reductions + select)
        mx = jnp.max(min_dist, axis=1, keepdims=True)  # (BT, 1)
        cand = jnp.where(min_dist == mx, lane_ids, jnp.int32(npad))
        nxt = jnp.min(cand, axis=1, keepdims=True)  # first max index per cloud
        idxs = jnp.where(out_lane_ids == j, nxt, idxs)
        return nxt, min_dist, idxs

    _, _, idxs = lax.fori_loop(
        1, npoint, body, (jnp.zeros((bt, 1), jnp.int32), min_dist0, idxs0)
    )
    idx_ref[:] = idxs


@functools.partial(jax.jit, static_argnums=0)
def farthest_point_sample(npoint: int, xyz: jax.Array) -> jax.Array:
    """Pallas FPS: xyz (B, N, 3) -> (B, npoint) int32 indices."""
    B, N, _ = xyz.shape
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    # FPS has no gradient (the reference registers none, tf_sampling.py:43-47);
    # cutting the tangent path here keeps the pallas_call out of AD traces.
    xyz = lax.stop_gradient(xyz)
    npad = _round_up(N, LANE)
    mpad = _round_up(npoint, LANE)
    # Clouds per grid step: 8 (a full sublane tile) while the ~6 working
    # (bt, Np) buffers fit VMEM; shrinks toward 1 at whole-scene N.
    budget_lanes = 2 ** 21  # ~8 MB of f32 working set
    bt = max(1, min(SUBLANE_TILE, budget_lanes // (6 * npad), B))
    bpad = _round_up(B, bt)
    x = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    x = jnp.pad(x, ((0, bpad - B), (0, 0), (0, npad - N)))

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_real=N)
    out = pl.pallas_call(
        kernel,
        grid=(bpad // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, 3, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (bt, mpad), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, mpad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=8 * bpad * npoint * npad,
            bytes_accessed=bpad * (3 * npad + mpad) * 4,
            transcendentals=0,
        ),
    )(x)
    return out[:B, :npoint]
