"""Fused farthest-point-sampling Pallas TPU kernel.

The jnp reference implementation (ops/geometry.py) expresses FPS as a
lax.fori_loop of (distance, min, argmax) over HBM-resident arrays — npoint
sequential XLA loop iterations, each touching (B, N) in HBM. This kernel runs
the ENTIRE loop on-chip: one grid program per cloud keeps the (3, N) points
and the (1, N) running min-distance in VMEM/vregs, so each of the npoint
iterations is a handful of VPU ops + one lane-reduction with zero HBM traffic.

Semantics match tf_ops/sampling/tf_sampling_g.cu:105-170 (and the jnp oracle):
first index 0, then argmax of the running min squared distance.

Layout notes:
  - points arrive as (B, 3, Np) with Np padded to a lane multiple (128);
    padded lanes get min_dist = -1 so they can never win the argmax;
  - the previous pick's coordinates are extracted with a one-hot
    multiply-reduce (dynamic scalar loads from the lane dim are not
    VPU-friendly), and the output indices are accumulated in a loop-carried
    one-hot-updated vector (Mosaic requires lane-aligned vector stores, so we
    write the whole index row once at the end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, idx_ref, *, npoint: int, n_real: int):
    # x_ref: (1, 3, Np) f32 ; idx_ref: (1, 1, Mp) i32
    xyz = x_ref[0]  # (3, Np)
    npad = xyz.shape[-1]
    mpad = idx_ref.shape[-1]

    lane_ids = lax.broadcasted_iota(jnp.int32, (1, npad), dimension=1)
    valid = lane_ids < n_real
    out_lane_ids = lax.broadcasted_iota(jnp.int32, (1, mpad), dimension=1)

    min_dist0 = jnp.where(valid, jnp.float32(1e38), jnp.float32(-1.0))
    idxs0 = jnp.zeros((1, mpad), jnp.int32)  # slot 0 = first pick = index 0

    def body(j, carry):
        last, min_dist, idxs = carry  # (1,1) i32, (1,Np) f32, (1,Mp) i32
        onehot = (lane_ids == last).astype(jnp.float32)  # (1, Np)
        p = jnp.sum(xyz * onehot, axis=1, keepdims=True)  # (3, 1)
        diff = xyz - p
        d = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, Np)
        min_dist = jnp.minimum(min_dist, d)
        # argmax as max + first-matching-lane (Mosaic's argmax lowering
        # fails at some shapes; this uses only max/min reductions + select)
        mx = jnp.max(min_dist, axis=1, keepdims=True)  # (1, 1)
        cand = jnp.where(min_dist == mx, lane_ids, jnp.int32(npad))
        nxt = jnp.min(cand, axis=1, keepdims=True)  # first max index
        idxs = jnp.where(out_lane_ids == j, nxt, idxs)
        return nxt, min_dist, idxs

    _, _, idxs = lax.fori_loop(
        1, npoint, body, (jnp.zeros((1, 1), jnp.int32), min_dist0, idxs0)
    )
    idx_ref[0] = idxs


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
    x = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if npad != N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, npad - N)))

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_real=N)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, npad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 1, mpad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, mpad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * npoint * npad,
            bytes_accessed=B * (3 * npad + mpad) * 4,
            transcendentals=0,
        ),
    )(x)
    return out[:, 0, :npoint]
