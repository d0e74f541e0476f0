"""Fused streaming kNN Pallas TPU kernel.

The jnp reference (ops/geometry.py:knn_point) materializes the full
(B, M, N) squared-distance matrix in HBM and runs lax.top_k over it — at
segmentation scale (B=4, M=1280, N=10240) that is a ~210 MB HBM round trip
per kNN call, twice per SA layer. This kernel never leaves the chip: one
grid cell per (cloud, query tile) holds the (3, N) support and a
(TILE_M, N) distance block in VMEM, computes distances on the MXU
((TILE_M,3)@(3,N)), and extracts the K nearest by iterative
min-extraction with lane invalidation (the same max/min+first-lane-select
reduction pattern as ops/pallas/fps.py, which lowers reliably on Mosaic).

Selection cost is O(K·N) VPU work per query tile — more arithmetic than
XLA's partial-sort top-k — so the net win depends on the HBM traffic saved;
adoption is measurement-gated in ops/dispatch.py (see scripts/bench_ops.py
and BENCH_OPS.md for the recorded comparison, VERDICT r1 item 2).

Semantics match the jnp oracle / reference contract
(utils/nearest_neighbors/knn_.cxx:104-135 via tf.py_func, and
tf_ops/grouping/tf_grouping.py:48-73):
  - exact k nearest by squared euclidean distance, ascending;
  - ties broken toward the lower support index (lax.top_k-stable);
  - when query ⊂ support, the query point is its own first neighbor.
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


def _knn_kernel(q_ref, s_ref, s2_ref, dist_ref, idx_ref, d2_scratch,
                *, k: int, n_real: int):
    # q_ref:  (1, TILE_M, 4) padded query xyz (4th column zero)
    # s_ref:  (1, 4, Np) padded support xyz, transposed
    # s2_ref: (1, 1, Np) support squared norms (padded lanes = +inf)
    # dist_ref/idx_ref: (1, TILE_M, Kp)
    # d2_scratch: (TILE_M, Np) f32
    q = q_ref[0]  # (TILE_M, 4)
    s = s_ref[0]  # (4, Np)
    npad = s.shape[-1]
    kp = dist_ref.shape[-1]

    # d2 = |q|^2 - 2 q.s + |s|^2 ; |s|^2 is precomputed with +inf padding so
    # padded support lanes can never be selected.
    qs = jnp.dot(q, s, preferred_element_type=jnp.float32)  # (TILE_M, Np) MXU
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (TILE_M, 1)
    d2_scratch[:] = q2 - 2.0 * qs + s2_ref[0]

    lane_ids = lax.broadcasted_iota(jnp.int32, (TILE_M, npad), dimension=1)
    out_lanes = lax.broadcasted_iota(jnp.int32, (TILE_M, kp), dimension=1)

    def body(j, carry):
        # Iterative min-extraction with lane invalidation. (A 2-pass
        # read-only threshold variant was measured 30% SLOWER on v5e — the
        # extra mask arithmetic outweighs the saved write; Mosaic fuses the
        # elementwise chains either way.)
        dists, idxs = carry  # (TILE_M, Kp) f32 / i32
        d2 = d2_scratch[:]
        md = jnp.min(d2, axis=1, keepdims=True)  # (TILE_M, 1)
        # argmin = first lane attaining the min (stable tie-break, like top_k)
        cand = jnp.where(d2 == md, lane_ids, jnp.int32(npad))
        mi = jnp.min(cand, axis=1, keepdims=True)  # (TILE_M, 1)
        dists = jnp.where(out_lanes == j, md, dists)
        idxs = jnp.where(out_lanes == j, mi, idxs)
        d2_scratch[:] = jnp.where(lane_ids == mi, _INF, d2)
        return dists, idxs

    dists0 = jnp.zeros((TILE_M, kp), jnp.float32)
    idxs0 = jnp.zeros((TILE_M, kp), jnp.int32)
    dists, idxs = lax.fori_loop(0, k, body, (dists0, idxs0))
    # Clamp the (distance-0-from-origin) artifacts of padded QUERY rows is
    # unnecessary: callers slice rows to the real M. Padded-support lanes are
    # excluded via the +inf in s2. Distances may carry tiny negative values
    # from the quadratic expansion; clamp to 0 to match |q-s|^2 >= 0.
    dist_ref[0] = jnp.maximum(dists, 0.0)
    idx_ref[0] = idxs


@functools.partial(jax.jit, static_argnums=0)
def knn_point(k: int, support: jax.Array, query: jax.Array):
    """Pallas kNN: support (B,N,3), query (B,M,3) -> (dist2, idx) (B,M,k).

    Gradients are cut (the reference's kNN runs under tf.py_func and carries
    none; downstream layers differentiate through the gather, not the search).
    """
    B, N, _ = support.shape
    M = query.shape[1]
    support = lax.stop_gradient(support.astype(jnp.float32))
    query = lax.stop_gradient(query.astype(jnp.float32))

    npad = _round_up(N, LANE)
    mpad = _round_up(M, TILE_M)
    kp = _round_up(k, LANE)

    # Support transposed to (B, 4, Np): xyz rows padded with a zero 4th row so
    # the MXU contraction dim is 4; padded lanes contribute via s2 = +inf.
    s = jnp.swapaxes(support, 1, 2)  # (B, 3, N)
    s = jnp.pad(s, ((0, 0), (0, 1), (0, npad - N)))
    s2 = jnp.sum(s * s, axis=1, keepdims=True)  # (B, 1, Np)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, npad), dimension=2)
    s2 = jnp.where(lane < N, s2, _INF)

    q = jnp.pad(query, ((0, 0), (0, mpad - M), (0, 1)))  # (B, Mp, 4)

    kernel = functools.partial(_knn_kernel, k=k, n_real=N)
    grid = (B, mpad // TILE_M)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_M, 4), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, npad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, kp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, kp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, mpad, kp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((TILE_M, npad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=B * mpad * npad * (8 + 4 * k),
            bytes_accessed=B * (mpad * 4 + 4 * npad + 2 * mpad * kp) * 4,
            transcendentals=0,
        ),
    )(q, s, s2)
    return dist[:, :M, :k], idx[:, :M, :k]
