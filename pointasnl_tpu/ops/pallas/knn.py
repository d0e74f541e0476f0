"""Fused streaming kNN Pallas TPU kernel.

The jnp reference (ops/geometry.py:knn_point) materializes the full
(B, M, N) squared-distance matrix in HBM and runs lax.top_k over it — and
XLA's sort/top_k lowering dominates entire train steps on this hardware
(measured 996 ms vs 104 ms per seg train step, BENCH_OPS.md). This kernel
never materializes distances in HBM and never sorts: the grid streams
(query-tile, support-chunk) pairs, each step computes a (TILE_M, TILE_N)
distance block on the MXU and folds it into a running top-k that lives in
the revisited output block (TPU grid steps are sequential, so the
accumulation is race-free). VMEM usage is bounded by TILE_N regardless of N,
so the same kernel serves the parity crops (N ~ 1-10k) and whole-scene
single-pass inference (N ~ 10^5+).

Selection is iterative min-extraction with lane invalidation — O(K·N) VPU
work per query. (A 2-pass read-only threshold variant measured 30% slower
on v5e; sorting-network alternatives pencil out within ~2x — see
BENCH_OPS.md.)

Semantics match the jnp oracle / reference contract
(utils/nearest_neighbors/knn_.cxx:104-135 via tf.py_func, and
tf_ops/grouping/tf_grouping.py:48-73):
  - exact k nearest by squared euclidean distance, ascending;
  - ties broken toward the lower support index (lax.top_k-stable): support
    chunks arrive in ascending index order and the running list is kept
    sorted, so earlier indices always win ties;
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
TILE_N = 4096  # support chunk of the streaming kernel; bounds VMEM at any N
# Up to this support size the whole (TILE_M, N) distance block stays resident
# in VMEM scratch — measured 2.2x faster than the streaming merge at parity
# scales. The cap leaves room for one (TILE_M, N) temporary next to the
# scratch under Mosaic's DEFAULT 16 MB scoped-VMEM limit (12288 ->
# 6.3 + 6.3 MB); past it the kernel raises the limit via
# pltpu.CompilerParams(vmem_limit_bytes) up to RESIDENT_RAISED_MAX_N —
# bounded by the toolchain's ~2^17-lane array ceiling (BENCH_OPS.md "FPS
# scene-scale compile boundary") — where the spatial kernel takes over.
RESIDENT_MAX_N = 12288
RESIDENT_RAISED_MAX_N = 65536
VMEM_LIMIT_BYTES = 112 * 2 ** 20
# Working-set size (scratch + one (TILE_M, Np) temporary) above which the
# raised limit is requested; below it the default 16 MB budget suffices.
VMEM_RAISE_THRESHOLD_BYTES = 15 * 2 ** 20
_INF = 3e38  # python float: jnp constants would be captured tracers


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel_resident(q_ref, s_ref, s2_ref, dist_ref, idx_ref, d2_scratch,
                         *, k: int):
    # Full support resident: q (1,TM,4); s (1,4,Np); s2 (1,1,Np);
    # outputs (1,TM,Kp); d2_scratch (TM,Np).
    q = q_ref[0]
    s = s_ref[0]
    npad = s.shape[-1]
    kp = dist_ref.shape[-1]

    # Direct differences (reference numerics, tf_grouping_g.cu:24): error
    # ~eps*d2, unlike the expansion's eps*(|q|^2+|s|^2). Accumulated INTO
    # the scratch one coordinate at a time so only one (TILE_M, Np)
    # temporary is ever live — a single three-term expression materializes
    # three and blows the 16 MB scoped-VMEM limit at large N (observed at
    # N=16384). Pad lanes are masked to +inf via the s2 row.
    d2_scratch[:] = jnp.square(q[:, 0:1] - s[0:1, :])
    d2_scratch[:] = d2_scratch[:] + jnp.square(q[:, 1:2] - s[1:2, :])
    d2_scratch[:] = d2_scratch[:] + jnp.square(q[:, 2:3] - s[2:3, :])
    d2_scratch[:] = jnp.where(s2_ref[0] < _INF, d2_scratch[:], _INF)

    lane_ids = lax.broadcasted_iota(jnp.int32, (TILE_M, npad), dimension=1)
    out_lanes = lax.broadcasted_iota(jnp.int32, (TILE_M, kp), dimension=1)

    def body(j, carry):
        # Iterative min-extraction with lane invalidation. (A 2-pass
        # read-only threshold variant was measured 30% SLOWER on v5e — the
        # extra mask arithmetic outweighs the saved write.)
        dists, idxs = carry
        d2 = d2_scratch[:]
        md = jnp.min(d2, axis=1, keepdims=True)
        # argmin = first lane attaining the min (stable tie-break, like top_k)
        cand = jnp.where(d2 == md, lane_ids, jnp.int32(npad))
        mi = jnp.min(cand, axis=1, keepdims=True)
        dists = jnp.where(out_lanes == j, md, dists)
        idxs = jnp.where(out_lanes == j, mi, idxs)
        d2_scratch[:] = jnp.where(lane_ids == mi, _INF, d2)
        return dists, idxs

    dists0 = jnp.zeros((TILE_M, kp), jnp.float32)
    idxs0 = jnp.zeros((TILE_M, kp), jnp.int32)
    dists, idxs = lax.fori_loop(0, k, body, (dists0, idxs0))
    dist_ref[0] = jnp.maximum(dists, 0.0)
    idx_ref[0] = idxs


def _knn_kernel(q_ref, s_ref, s2_ref, dist_ref, idx_ref, *, k: int, tn: int):
    # q_ref:  (1, TILE_M, 4) padded query xyz (4th column zero)
    # s_ref:  (1, 4, TILE_N) support chunk, transposed
    # s2_ref: (1, 1, TILE_N) support squared norms (+inf beyond N)
    # dist_ref/idx_ref: (1, TILE_M, Kp) — running top-k, revisited across
    #   support chunks (grid dim 2)
    nt = pl.program_id(2)
    q = q_ref[0]  # (TILE_M, 4)
    s = s_ref[0]  # (4, TILE_N)
    kp = dist_ref.shape[-1]

    # direct differences (see the resident kernel); +inf on padded lanes
    d2 = (
        jnp.square(q[:, 0:1] - s[0:1, :])
        + jnp.square(q[:, 1:2] - s[1:2, :])
        + jnp.square(q[:, 2:3] - s[2:3, :])
    )
    d2c = jnp.where(s2_ref[0] < _INF, d2, _INF)

    base = nt * tn
    chunk_ids = base + lax.broadcasted_iota(jnp.int32, d2c.shape, dimension=1)

    @pl.when(nt == 0)
    def _():
        dist_ref[0] = jnp.full(dist_ref.shape[1:], _INF, jnp.float32)
        idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)

    # Candidates = running top-k (sorted, lower global indices — ties keep
    # the earlier index by first-position stability) ++ this chunk.
    cand_d = jnp.concatenate([dist_ref[0], d2c], axis=1)  # (TILE_M, Kp+Tn)
    cand_i = jnp.concatenate([idx_ref[0], chunk_ids], axis=1)
    pos = lax.broadcasted_iota(jnp.int32, cand_d.shape, dimension=1)
    npos = cand_d.shape[-1]
    out_lanes = lax.broadcasted_iota(jnp.int32, (TILE_M, kp), dimension=1)

    def body(j, carry):
        cd, dists, idxs = carry
        md = jnp.min(cd, axis=1, keepdims=True)  # (TILE_M, 1)
        # first position attaining the min (stable tie-break, like top_k)
        first = jnp.min(
            jnp.where(cd == md, pos, jnp.int32(npos)), axis=1, keepdims=True
        )
        mi = jnp.sum(jnp.where(pos == first, cand_i, 0), axis=1, keepdims=True)
        dists = jnp.where(out_lanes == j, md, dists)
        idxs = jnp.where(out_lanes == j, mi, idxs)
        cd = jnp.where(pos == first, _INF, cd)  # invalidate extracted slot
        return cd, dists, idxs

    dists0 = jnp.full((TILE_M, kp), _INF, jnp.float32)
    idxs0 = jnp.zeros((TILE_M, kp), jnp.int32)
    _, dists, idxs = lax.fori_loop(0, k, body, (cand_d, dists0, idxs0))
    dist_ref[0] = dists
    idx_ref[0] = idxs


def _spatial_mode() -> str:
    import os

    return os.environ.get("POINTASNL_KNN_SPATIAL", "auto")


def knn_point(k: int, support: jax.Array, query: jax.Array):
    """Pallas kNN: support (B,N,3), query (B,M,3) -> (dist2, idx) (B,M,k).

    Routing (POINTASNL_KNN_SPATIAL={auto,always,never} overrides):
      - k > N: jnp oracle (degenerate padding semantics);
      - N <= RESIDENT_MAX_N: VMEM-resident full-scan kernel (fastest at the
        parity crop scales — measured vs the spatial kernel, BENCH_OPS.md);
      - larger N: the Morton/bounding-sphere pruned kernel (knn_spatial.py),
        measured 5.4x the streaming scan at N=131072; VMEM-resident pack to
        N=262144, HBM pack with per-visit DMA — and a two-level
        supersegment/supertile visit ordering past 524288 — to N=2097152;
      - beyond that: the streaming chunk kernel.

    Gradients are cut (the reference's kNN runs under tf.py_func and carries
    none; downstream layers differentiate through the gather, not the search).
    """
    N = support.shape[1]
    if k > N:
        # Degenerate k > N repeats the farthest valid neighbor — rare and
        # small; the jnp oracle handles it.
        from pointasnl_tpu.ops import geometry as _g

        return _g.knn_point(k, support, query)
    mode = _spatial_mode()
    if mode == "always" or (mode != "never" and N > RESIDENT_MAX_N):
        from pointasnl_tpu.ops.pallas import knn_spatial as _ks

        if k <= _ks.KP and N <= _ks.MAX_SPATIAL_HBM_N:
            # Called OUTSIDE any jit wrapper of ours so knn_spatial can see
            # whether query IS support (the self-kNN layers pass xyz twice).
            return _ks.knn_point(k, support, query)
    return _knn_scan(k, support, query)


@functools.partial(jax.jit, static_argnums=0)
def _knn_scan(k: int, support: jax.Array, query: jax.Array):
    B, N, _ = support.shape
    M = query.shape[1]
    support = lax.stop_gradient(support.astype(jnp.float32))
    query = lax.stop_gradient(query.astype(jnp.float32))

    resident = N <= RESIDENT_RAISED_MAX_N
    tn = _round_up(N, LANE) if resident else min(TILE_N, _round_up(N, LANE))
    npad = _round_up(N, tn)
    mpad = _round_up(M, TILE_M)
    kp = _round_up(k, LANE)

    # Support transposed to (B, 4, Np): xyz rows padded with a zero 4th row so
    # the MXU contraction dim is 4; padded lanes are excluded via s2 = +inf.
    s = jnp.swapaxes(support, 1, 2)  # (B, 3, N)
    s = jnp.pad(s, ((0, 0), (0, 1), (0, npad - N)))
    s2 = jnp.sum(s * s, axis=1, keepdims=True)  # (B, 1, Np)
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, npad), dimension=2)
    s2 = jnp.where(lane < N, s2, _INF)

    q = jnp.pad(query, ((0, 0), (0, mpad - M), (0, 1)))  # (B, Mp, 4)

    if resident:
        kernel = functools.partial(_knn_kernel_resident, k=k)
        grid = (B, mpad // TILE_M)
        in_specs = [
            pl.BlockSpec((1, TILE_M, 4), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, npad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((1, TILE_M, kp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, kp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch = [pltpu.VMEM((TILE_M, npad), jnp.float32)]
    else:
        kernel = functools.partial(_knn_kernel, k=k, tn=tn)
        grid = (B, mpad // TILE_M, npad // tn)
        in_specs = [
            pl.BlockSpec((1, TILE_M, 4), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tn), lambda b, m, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda b, m, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((1, TILE_M, kp), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, kp), lambda b, m, n: (b, m, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch = []

    # Past the default 16 MB scoped-VMEM budget (scratch + one (TILE_M, Np)
    # temporary), raise the Mosaic limit instead of falling to the slower
    # merge paths — v5e has 128 MB physical VMEM and the revisited-support
    # grid has no pipelining to starve at these block sizes.
    vmem_limit = None
    if resident and TILE_M * npad * 8 > VMEM_RAISE_THRESHOLD_BYTES:
        vmem_limit = VMEM_LIMIT_BYTES

    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, mpad, kp), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=B * mpad * npad * (8 + 4 * k),
            bytes_accessed=B * (mpad * 4 + 4 * npad + 2 * mpad * kp) * 4,
            transcendentals=0,
        ),
    )(q, s, s2)
    return dist[:, :M, :k], idx[:, :M, :k]
