"""Support-sharded geometry ops for multi-chip whole-scene processing.

One v5e chip handles whole scenes to N=2097152 (the spatial kNN kernel's
two-level HBM-pack cap); beyond that — or to cut latency — the support axis
shards over the mesh. These are the TPU-native equivalents of a distributed KD-tree: each
device runs the exact on-chip search over its support shard, and the
cross-device combine is a single all_gather of (B, M, k) candidates over ICI
(k*D values per query, tiny next to the O(N) scan it replaces).

Exactness, including the oracle's tie rule (lower support index wins):
  - within a shard, the local kernel already emits (distance asc, index asc);
  - shards are concatenated in axis-index order, so candidate POSITIONS are
    ordered (distance-within-shard, shard-ascending) and `lax.top_k`'s
    positional stability resolves cross-shard distance ties toward the lower
    shard = the lower global index.

Sharded FPS runs the same iterative scheme as the single-chip kernel with a
two-scalar collective per step: local (max, argmax) of the running min
distance, then a global argmax that breaks value ties toward the lower
global index, matching jnp.argmax's first-occurrence rule on one device.

Used via shard_map over a Mesh axis; tests drive an 8-device virtual CPU
mesh (tests/test_sharded_knn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pointasnl_tpu import ops


def knn_point_sharded(k: int, support: jax.Array, query: jax.Array,
                      mesh: Mesh, axis: str = "data"):
    """Exact kNN with support (B, N, 3) sharded on N over `axis`.

    query (B, M, 3) is replicated; results (B, M, k) are replicated (every
    device computes the same merge from the gathered candidates). Requires
    N divisible by the axis size and k <= N // D so each shard can produce
    k real candidates.
    """
    B, N, _ = support.shape
    D = mesh.shape[axis]
    if N % D or k > N // D:
        raise ValueError(
            f"knn_point_sharded: N={N} must divide by axis size {D} "
            f"with k={k} <= {N // D}"
        )
    shard_n = N // D

    def local_fn(sup, qry):  # sup (B, shard_n, 3), qry (B, M, 3)
        d, i = ops.knn_point(k, sup, qry)
        i = i + lax.axis_index(axis) * shard_n
        ds = lax.all_gather(d, axis)  # (D, B, M, k), shard-ascending
        is_ = lax.all_gather(i, axis)
        cand_d = jnp.moveaxis(ds, 0, 2).reshape(B, qry.shape[1], D * k)
        cand_i = jnp.moveaxis(is_, 0, 2).reshape(B, qry.shape[1], D * k)
        neg, sel = lax.top_k(-cand_d, k)  # positional stability = tie rule
        return -neg, jnp.take_along_axis(cand_i, sel, axis=-1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(support, query)


def knn_point_query_sharded(k: int, support: jax.Array, query: jax.Array,
                            mesh: Mesh, axis: str = "data"):
    """Exact kNN with QUERIES (B, M, 3) sharded on M over `axis`.

    The complementary decomposition to knn_point_sharded: support xyz is
    small (N*12 bytes) and replicates, each device searches the full support
    for its own query rows with the on-chip kernels, and there is NO
    cross-device merge at all — outputs stay query-sharded. This is the
    latency-optimal layout when the same mesh also shards downstream
    per-point compute (e.g. the whole-scene head convs).
    """
    M = query.shape[1]
    D = mesh.shape[axis]
    if M % D:
        raise ValueError(f"knn_point_query_sharded: M={M} % {D} != 0")

    def local_fn(sup, qry):  # sup (B, N, 3) replicated, qry (B, M/D, 3)
        return ops.knn_point(k, sup, qry)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=(P(None, axis, None), P(None, axis, None)),
        check_vma=False,
    )
    return fn(support, query)


def farthest_point_sample_sharded(npoint: int, xyz: jax.Array,
                                  mesh: Mesh, axis: str = "data") -> jax.Array:
    """FPS with xyz (B, N, 3) sharded on N; returns replicated (B, npoint).

    Matches ops.farthest_point_sample exactly: first pick is global index 0,
    then iterated argmax of the running min squared distance with
    first-occurrence (lowest-index) tie-breaks.
    """
    B, N, _ = xyz.shape
    D = mesh.shape[axis]
    if N % D:
        raise ValueError(f"farthest_point_sample_sharded: N={N} % {D} != 0")
    shard_n = N // D

    def local_fn(x):  # (B, shard_n, 3)
        sid = lax.axis_index(axis)
        base = sid * shard_n
        lane = jnp.arange(shard_n, dtype=jnp.int32)[None, :]  # (1, shard_n)

        def point_at(gidx):  # gather xyz of a GLOBAL index -> (B, 3) replicated
            local = jnp.clip(gidx - base, 0, shard_n - 1)
            mine = (gidx >= base) & (gidx < base + shard_n)
            p = jnp.take_along_axis(x, local[:, None, None], axis=1)[:, 0]
            return lax.psum(jnp.where(mine[:, None], p, 0.0), axis)

        def body(j, carry):
            min_dist, last, idxs = carry
            p = point_at(last)  # (B, 3)
            d = jnp.sum(jnp.square(x - p[:, None, :]), axis=-1)
            min_dist = jnp.minimum(min_dist, d)
            # local argmax, first occurrence
            mx = jnp.max(min_dist, axis=1)  # (B,)
            cand = jnp.where(min_dist == mx[:, None], base + lane, N)
            mi = jnp.min(cand, axis=1)  # (B,) global index of local best
            # global: max value, ties toward the lower global index
            vals = lax.all_gather(mx, axis)  # (D, B)
            inds = lax.all_gather(mi, axis)
            gmx = jnp.max(vals, axis=0)  # (B,)
            nxt = jnp.min(jnp.where(vals == gmx[None, :], inds, N), axis=0)
            nxt = nxt.astype(jnp.int32)
            idxs = lax.dynamic_update_slice_in_dim(idxs, nxt[:, None], j, axis=1)
            return min_dist, nxt, idxs

        init = (
            # xyz.dtype, not f32: the body's minimum() promotes with the
            # distance dtype and fori_loop requires a fixed carry type
            jnp.full((B, shard_n), 1e38, x.dtype),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, npoint), jnp.int32),
        )
        _, _, idxs = lax.fori_loop(1, npoint, body, init)
        return idxs

    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None),),
        out_specs=P(),
        check_vma=False,
    )
    return fn(xyz)
