"""Geometry primitives for point-cloud networks, as pure JAX functions.

These are the TPU-native replacements for the reference's three custom TF op
libraries (behavioral contracts cited per function):

- farthest point sampling      <- tf_ops/sampling/tf_sampling_g.cu:105-170
- point gather                 <- tf_ops/sampling/tf_sampling.cpp:126-150
- ball query                   <- tf_ops/grouping/tf_grouping_g.cu:3-36
- neighborhood grouping        <- tf_ops/grouping/tf_grouping_g.cu:40-57
- k-nearest neighbors          <- utils/nearest_neighbors/knn_.cxx:104-135 (nanoflann)
                                  and tf_ops/grouping/tf_grouping.py:48-73
- three_nn / three_interpolate <- tf_ops/3d_interpolation/tf_interpolate.cpp:60-153

Everything here is fixed-shape, batched, differentiable (where the reference op
has a gradient), and jit/pjit-compatible: no data-dependent shapes, no host
round-trips. The reference instead crossed the device boundary per layer
(tf.py_func kNN at utils/pointasnl_util.py:62; CPU-only three_nn at
tf_ops/3d_interpolation/tf_interpolate.cpp:187) — keeping the whole step
on-device is the main structural win of this rebuild.

Distance computations are DIRECT squared differences in float32 — the same
formula as the reference's CUDA kernels and nanoflann — because the
MXU-friendly |q|^2+|s|^2-2qs expansion loses eps*|coord|^2 of absolute
accuracy (measurably mis-ranking neighbors at scene scale; see
BENCH_OPS.md "Scene-scale numerics").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# Matches the CUDA kernel's initialization of the running min-distance buffer
# (temp[j] = 1e38 at tf_sampling_g.cu:121).
_FPS_INF = 1e38


def pairwise_sqdist(query: Array, support: Array, *, precision=None) -> Array:
    """Squared euclidean distances between two batched point sets.

    Computed as DIRECT differences, sum((q - s)^2), matching the reference
    kernels bit-for-bit in formula (tf_grouping_g.cu:24, nanoflann's L2
    adapter): error stays ~eps*d2. The MXU-friendly |q|^2+|s|^2-2qs
    expansion was used here originally, but its error grows as
    eps*(|q|^2+|s|^2) — ~2e-5 absolute on a 9 m scene, enough to mis-rank
    ~1% of neighbors at scan density, and catastrophic for clouds far from
    the origin (BENCH_OPS.md "Scene-scale numerics"). XLA fuses the
    broadcast-subtract-square-reduce, so no (B, M, N, 3) tensor
    materializes. `precision` is accepted for backward compatibility and
    ignored (no matmul remains).

    Args:
      query:   (B, M, 3) float array.
      support: (B, N, 3) float array.

    Returns:
      (B, M, N) float32 squared distances.
    """
    del precision
    query = query.astype(jnp.float32)
    support = support.astype(jnp.float32)
    diff = query[:, :, None, :] - support[:, None, :, :]
    return jnp.sum(jnp.square(diff), axis=-1)


def farthest_point_sample(npoint: int, xyz: Array) -> Array:
    """Iterative farthest point sampling.

    Matches tf_ops/sampling/tf_sampling_g.cu:105-170: the first sampled index
    is always 0; each subsequent pick maximizes the running minimum squared
    distance to the already-picked set. Sampling randomness therefore comes
    from input point order (provider.shuffle_points in the reference).

    Args:
      npoint: number of points to sample (static).
      xyz: (B, N, 3) point coordinates.

    Returns:
      (B, npoint) int32 indices into N.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)

    def body(j, carry):
        min_dist, last, idxs = carry
        p = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B, 1, 3)
        d = jnp.sum(jnp.square(xyz - p), axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)  # (B,)
        idxs = lax.dynamic_update_slice_in_dim(idxs, nxt[:, None], j, axis=1)
        return min_dist, nxt, idxs

    idxs0 = jnp.zeros((B, npoint), jnp.int32)
    init = (jnp.full((B, N), _FPS_INF, jnp.float32), jnp.zeros((B,), jnp.int32), idxs0)
    _, _, idxs = lax.fori_loop(1, npoint, body, init)
    return idxs


def gather_point(points: Array, idx: Array) -> Array:
    """Gather points (B, N, C) by per-batch indices (B, M) -> (B, M, C).

    Equivalent of tf_ops/sampling GatherPoint (tf_sampling.cpp:126-150); the
    scatter-add gradient (tf_sampling_g.cu:186-192) falls out of JAX autodiff.
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_point(points: Array, idx: Array) -> Array:
    """Gather neighborhoods: points (B, N, C), idx (B, M, K) -> (B, M, K, C).

    Equivalent of tf_ops/grouping GroupPoint (tf_grouping_g.cu:40-57); the
    atomic-add gradient (:60-78) is replaced by JAX's deterministic scatter-add.
    """
    B, M, K = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(B, M * K)[..., None], axis=1)
    return flat.reshape(B, M, K, points.shape[-1])


# Above this many (B*M*N) distance-matrix elements (= 1 GiB float32),
# knn_point switches to the memory-bounded chunked path — whole-scene
# single-pass shapes would otherwise materialize tens of GB in HBM.
# Env-overridable for benchmarking the dense path at any size.
import os as _os

_DENSE_KNN_MAX_ELEMENTS = int(
    _os.environ.get("POINTASNL_DENSE_KNN_MAX", 2**28)
)


def knn_point(k: int, support: Array, query: Array) -> Tuple[Array, Array]:
    """Exact k-nearest-neighbor search by brute force on-device.

    Replaces both the nanoflann KD-tree host library (utils/nearest_neighbors/
    knn_.cxx:104-135, consumed through tf.py_func at utils/pointasnl_util.py:62)
    and the selection-sort GPU path (tf_ops/grouping/tf_grouping.py:48-73).
    The parity workloads have N <= ~10240, so an MXU-tiled O(M*N) distance
    matrix + top-k beats a host KD-tree round trip by a wide margin; beyond
    ~1 GiB of distance matrix (whole-scene single-pass inference) the search
    streams through knn_point_chunked instead, with identical results.

    Args:
      k: number of neighbors (static).
      support: (B, N, 3) points searched over.
      query:   (B, M, 3) query points.

    Returns:
      (dist2, idx): (B, M, k) squared distances (ascending) and int32 indices.
      When query is a subset of support, the query point itself is its own
      first neighbor (distance 0), matching the reference.
    """
    B, N, _ = support.shape
    M = query.shape[1]
    if B * M * N > _DENSE_KNN_MAX_ELEMENTS and N >= k:
        return knn_point_chunked(k, support, query)
    d2 = pairwise_sqdist(query, support)  # (B, M, N)
    k_eff = min(k, N)
    neg, idx = lax.top_k(-d2, k_eff)
    dist, idx = -neg, idx.astype(jnp.int32)
    if k_eff < k:  # degenerate k > N: repeat the farthest valid neighbor
        pad = k - k_eff
        dist = jnp.concatenate([dist, jnp.repeat(dist[..., -1:], pad, axis=-1)], axis=-1)
        idx = jnp.concatenate([idx, jnp.repeat(idx[..., -1:], pad, axis=-1)], axis=-1)
    return dist, idx


def knn_point_chunked(
    k: int,
    support: Array,
    query: Array,
    *,
    query_block: int = 4096,
    support_block: int = 8192,
) -> Tuple[Array, Array]:
    """Exact kNN with O(B*query_block*support_block) transient memory.

    Same contract as knn_point (including stable lower-index tie-breaks: the
    running top-k is listed before each new chunk's candidates, and chunks
    arrive in index order), but the (M, N) distance matrix never exists —
    query tiles scan over support chunks with a running top-k merge. This is
    the memory-bounded search used for whole-scene single-pass inference
    (SURVEY.md §5.7), where M and N reach scene size (10^5+ points).

    Not differentiable (gradients are cut, like the reference's py_func kNN).
    """
    B, N, _ = support.shape
    M = query.shape[1]
    if N < k:
        return knn_point(k, support, query)  # degenerate: dense handles padding
    support = lax.stop_gradient(support.astype(jnp.float32))
    query = lax.stop_gradient(query.astype(jnp.float32))

    sb = min(support_block, N)
    qb = min(query_block, M)
    n_pad = (-N) % sb
    m_pad = (-M) % qb
    if n_pad:
        support = jnp.pad(support, ((0, 0), (0, n_pad), (0, 0)))
    if m_pad:
        query = jnp.pad(query, ((0, 0), (0, m_pad), (0, 0)))
    n_chunks = (N + n_pad) // sb
    n_qblocks = (M + m_pad) // qb

    # (n_chunks, B, sb, 3) support chunks + their global index offsets.
    s_chunks = support.reshape(B, n_chunks, sb, 3).swapaxes(0, 1)
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * sb
    lane = jnp.arange(sb, dtype=jnp.int32)

    def per_query_block(q_blk):  # (B, qb, 3)
        def scan_body(carry, chunk):
            best_d, best_i = carry  # (B, qb, k)
            s_blk, off = chunk
            d2 = pairwise_sqdist(q_blk, s_blk)  # (B, qb, sb)
            gidx = off + lane  # (sb,)
            d2 = jnp.where(gidx[None, None, :] < N, d2, jnp.float32(_FPS_INF))
            cand_d = jnp.concatenate([best_d, d2], axis=-1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(gidx, d2.shape).astype(jnp.int32)], axis=-1
            )
            neg, sel = lax.top_k(-cand_d, k)
            return (-neg, jnp.take_along_axis(cand_i, sel, axis=-1)), None

        init = (
            jnp.full((B, qb, k), jnp.float32(_FPS_INF)),
            jnp.zeros((B, qb, k), jnp.int32),
        )
        (d, i), _ = lax.scan(scan_body, init, (s_chunks, offsets))
        return d, i

    q_blocks = query.reshape(B, n_qblocks, qb, 3).swapaxes(0, 1)
    dists, idxs = lax.map(per_query_block, q_blocks)  # (n_qblocks, B, qb, k)
    dists = dists.swapaxes(0, 1).reshape(B, M + m_pad, k)[:, :M]
    idxs = idxs.swapaxes(0, 1).reshape(B, M + m_pad, k)[:, :M]
    return dists, idxs


def query_ball_point(radius: float, nsample: int, xyz: Array, new_xyz: Array) -> Tuple[Array, Array]:
    """Fixed-radius neighborhood query with the reference's exact padding rule.

    Matches tf_ops/grouping/tf_grouping_g.cu:3-36:
      - a point is "in the ball" iff euclidean distance < radius (strict);
      - the FIRST `nsample` in-ball points in index order are kept;
      - if fewer than `nsample` are found, remaining slots repeat the FIRST
        in-ball index;
      - pts_cnt is the number of in-ball points found, capped at nsample.
    If the ball is empty (cannot happen when query is a subset of support),
    indices are 0 and pts_cnt is 0.

    Args:
      radius: ball radius (static float).
      nsample: max neighbors (static int).
      xyz:     (B, N, 3) support points.
      new_xyz: (B, M, 3) query points.

    Returns:
      (idx, pts_cnt): (B, M, nsample) int32 and (B, M) int32.
    """
    B, N, _ = xyz.shape
    d2 = pairwise_sqdist(new_xyz, xyz)  # (B, M, N)
    mask = d2 < (radius * radius)
    arange = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    cand = jnp.where(mask, arange, N)  # out-of-ball -> sentinel N
    # k smallest candidate indices == first nsample in-ball points in order.
    k = min(nsample, N)
    neg_sorted, _ = lax.top_k(-cand, k)
    sel = -neg_sorted  # (B, M, k) ascending
    if k < nsample:  # more slots than support points: extra slots are padding
        sel = jnp.concatenate(
            [sel, jnp.full(sel.shape[:-1] + (nsample - k,), N, sel.dtype)], axis=-1
        )
    valid = sel < N
    first = sel[..., :1]
    pad = jnp.where(first < N, first, 0)
    idx = jnp.where(valid, sel, pad).astype(jnp.int32)
    cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(jnp.int32)
    return idx, cnt


def three_nn(xyz1: Array, xyz2: Array) -> Tuple[Array, Array]:
    """Three nearest neighbors of xyz1 within xyz2, with SQUARED distances.

    Matches tf_ops/3d_interpolation/tf_interpolate.cpp:60-103 (note: the
    reference returns squared distances — the 1/dist IDW weights downstream
    are computed on squared distances, which is part of the numerics contract).
    Gradient is blocked, as in the reference (tf_interpolate.py:18).

    Returns:
      (dist2, idx): both (B, M1, 3); dist2 ascending.
    """
    N = xyz2.shape[1]
    if N < 3:
        # Degenerate support (< 3 points): the reference's CPU kernel leaves
        # the missing slots at (best=1e40, besti=0) — IDW weight ~ 0. We use
        # 1e38 (float32-representable) for the same effect.
        d2, idx = knn_point(N, xyz2, xyz1)
        pad = 3 - N
        d2 = jnp.concatenate(
            [d2, jnp.full(d2.shape[:-1] + (pad,), 1e38, d2.dtype)], axis=-1
        )
        idx = jnp.concatenate([idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
    else:
        d2, idx = knn_point(3, xyz2, xyz1)
    return lax.stop_gradient(d2), idx


def three_interpolate(points: Array, idx: Array, weight: Array,
                      group_point_fn=None) -> Array:
    """Weighted interpolation from 3 neighbors.

    Matches tf_ops/3d_interpolation/tf_interpolate.cpp:107-130; gradient
    (scatter of weighted cotangents, :191-262) comes from autodiff.
    `group_point_fn` lets ops.dispatch substitute the MXU-gradient gather
    (ops/scatter.py) on TPU.

    Args:
      points: (B, M2, C) source features.
      idx:    (B, M1, 3) int32 neighbor indices into M2.
      weight: (B, M1, 3) interpolation weights.

    Returns:
      (B, M1, C) interpolated features.
    """
    gp = group_point_fn or group_point
    gathered = gp(points, idx)  # (B, M1, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolate_idw(xyz1: Array, xyz2: Array, points2: Array,
                          three_nn_fn=None, group_point_fn=None) -> Array:
    """three_nn + inverse-distance-weighted three_interpolate, fused.

    Mirrors the composite used at utils/pointnet_util.py:211-216 and
    utils/pointasnl_util.py:307-320: weights are (1/d2) normalized over the
    3 neighbors, with d2 clamped to >= 1e-10 first. `three_nn_fn` lets
    ops.dispatch substitute the Pallas-backed search while this single body
    owns the weight numerics.
    """
    dist2, idx = (three_nn_fn or three_nn)(xyz1, xyz2)
    dist2 = jnp.maximum(dist2, 1e-10)
    inv = 1.0 / dist2
    weight = inv / jnp.sum(inv, axis=2, keepdims=True)
    return three_interpolate(points2, idx, weight, group_point_fn=group_point_fn)


def prob_sample(inp: Array, inp_r: Array) -> Array:
    """Inverse-CDF categorical sampling (API-parity port of ProbSample).

    Matches tf_ops/sampling/tf_sampling_g.cu:7-104 (cumsum + binary search):
    given per-batch unnormalized category weights ``inp`` (B, N) and uniform
    randoms ``inp_r`` (B, M) in [0, sum), returns (B, M) int32 category ids.
    Dead code in the reference model path (SURVEY.md 2.8) — provided for
    API parity only.
    """
    cdf = jnp.cumsum(inp, axis=-1)  # (B, N)
    # searchsorted per batch row: index of first cdf element > r.
    idx = jax.vmap(lambda c, r: jnp.searchsorted(c, r, side="right"))(cdf, inp_r)
    return jnp.clip(idx, 0, inp.shape[-1] - 1).astype(jnp.int32)


def sampling(npoint: int, pts: Array, feature: Optional[Array] = None):
    """FPS + gather, the reference's `sampling` (utils/pointasnl_util.py:33-49)."""
    fps_idx = farthest_point_sample(npoint, pts)
    if feature is None:
        return gather_point(pts, fps_idx)
    return gather_point(pts, fps_idx), gather_point(feature, fps_idx)


def grouping(
    feature: Array,
    k: int,
    src_xyz: Array,
    q_xyz: Array,
    *,
    use_xyz: bool = True,
    use_knn: bool = True,
    radius: float = 0.2,
    idx: Optional[Array] = None,
    group_point_fn=None,
) -> Tuple[Array, Array, Array]:
    """Neighborhood grouping, the reference's `grouping` (utils/pointasnl_util.py:51-76).

    Returns (grouped_xyz, grouped_feature, idx) with shapes
    (B, M, K, 3), (B, M, K, C[+3]), (B, M, K). The ball-query branch of the
    reference had a latent bug (undefined `idx` for feature gather,
    pointasnl_util.py:67-71 — only the kNN path ever ran); here the ball
    branch is implemented correctly: features are gathered by ball indices.

    `idx` short-circuits the neighbor search with precomputed indices — used
    by the models to reuse rows of an already-computed self-kNN graph when
    the query set is a subset of the support set (exact, since each query's
    neighbors are independent of the rest of the query set).
    """
    gp = group_point_fn or group_point
    if idx is None:
        if use_knn:
            _, idx = knn_point(k, src_xyz, q_xyz)
        else:
            idx, _ = query_ball_point(radius, k, src_xyz, q_xyz)
    grouped_xyz = gp(src_xyz, idx)
    grouped_feature = gp(feature, idx)
    if use_xyz:
        grouped_feature = jnp.concatenate([grouped_xyz, grouped_feature], axis=-1)
    return grouped_xyz, grouped_feature, idx


def repulsion_loss(pred: Array, nsample: int = 20, radius: float = 0.07, h: float = 0.03,
                   ball_query_fn=None, group_point_fn=None) -> Array:
    """Uniformity (repulsion) penalty on sampled point positions.

    Matches utils/pointasnl_util.py:361-378: ball-query `nsample` neighbors in
    `radius`, take the 5 nearest (dropping self), and penalize
    mean(radius - dist * exp(-dist^2 / h^2)).

    `ball_query_fn` lets ops.dispatch substitute the Pallas ball query (the
    remaining top_k over nsample=20 lanes is tiny and stays in XLA);
    `group_point_fn` the MXU-gradient gather (ops/scatter.py).
    """
    ball = ball_query_fn or query_ball_point
    gp = group_point_fn or group_point
    idx, _ = ball(radius, nsample, pred, pred)
    grouped = gp(pred, idx) - pred[:, :, None, :]
    dist2 = jnp.sum(jnp.square(grouped), axis=-1)  # (B, M, nsample)
    neg_top, _ = lax.top_k(-dist2, 5)
    dist2 = -neg_top[..., 1:]  # drop self (nearest)
    dist2 = jnp.maximum(dist2, 1e-12)
    dist = jnp.sqrt(dist2)
    weight = jnp.exp(-dist2 / (h * h))
    return jnp.mean(radius - dist * weight)
