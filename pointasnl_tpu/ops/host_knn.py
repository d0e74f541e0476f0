"""Host-side kNN helpers (the nearest_neighbors library surface).

The model path uses the on-device ops.knn_point (the tf.py_func host round
trip is gone — SURVEY.md §2.1 note). These helpers keep the host-side API the
reference exported for data tooling (utils/nearest_neighbors/knn.pyx:33-148):

  - knn / knn_batch: exact kNN — served by the native C++ KD-tree + OpenMP
    extension (pointasnl_tpu/native/csrc/host_knn_ext.cpp, our redesign of
    the nanoflann role) with a sklearn KDTree fallback when the extension
    isn't built;
  - knn_batch_distance_pick: coverage-aware query sampling
    (utils/nearest_neighbors/knn_.cxx:138-271 semantics: repeatedly pick a
    random least-used point, take its K nearest, bump their usage counters,
    heavily penalize re-picking the query itself).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from pointasnl_tpu.native import host_knn_ext as _ext
except ImportError:  # extension not built: sklearn fallback
    _ext = None


def knn(pts: np.ndarray, queries: np.ndarray, K: int, omp: bool = False) -> np.ndarray:
    """Exact kNN of queries within one cloud: (N, D), (M, D) -> (M, K) int64."""
    if _ext is not None:
        return _ext.knn(
            np.ascontiguousarray(pts, np.float32),
            np.ascontiguousarray(queries, np.float32),
            K,
            omp=omp,
        )
    from sklearn.neighbors import KDTree

    tree = KDTree(pts, leaf_size=10)
    return tree.query(queries, k=K, return_distance=False).astype(np.int64)


def knn_batch(pts: np.ndarray, queries: np.ndarray, K: int, omp: bool = False) -> np.ndarray:
    """Batched exact kNN: (B, N, D), (B, M, D) -> (B, M, K) int64."""
    if _ext is not None:
        return _ext.knn_batch(
            np.ascontiguousarray(pts, np.float32),
            np.ascontiguousarray(queries, np.float32),
            K,
            omp=omp,
        )
    return np.stack([knn(pts[b], queries[b], K) for b in range(pts.shape[0])])


def knn_batch_distance_pick(
    pts: np.ndarray,
    nqueries: int,
    K: int,
    omp: bool = False,
    random_state: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Coverage-aware query sampling + kNN.

    Returns (queries (B, nqueries, D), indices (B, nqueries, K)). Each round
    picks a random point among those with the minimal usage count, queries its
    K nearest neighbors, increments their counters, and adds +100 to the
    picked point so it is effectively never re-picked.
    """
    if _ext is not None:
        # no random_state -> a fresh global-np draw, matching the sklearn
        # fallback's np.random behavior (a fixed seed here would make every
        # call pick identical query sets)
        rs = random_state if random_state is not None else np.random
        seed = int(rs.randint(2**31))
        return _ext.knn_batch_distance_pick(
            np.ascontiguousarray(pts, np.float32), nqueries, K, seed=seed, omp=omp
        )
    from sklearn.neighbors import KDTree

    rs = random_state if random_state is not None else np.random
    B, N, dim = pts.shape
    queries = np.zeros((B, nqueries, dim), pts.dtype)
    indices = np.zeros((B, nqueries, K), np.int64)
    for b in range(B):
        tree = KDTree(pts[b], leaf_size=10)
        used = np.zeros(N, np.int64)
        for q in range(nqueries):
            candidates = np.flatnonzero(used == used.min())
            index = int(candidates[rs.randint(len(candidates))])
            query = pts[b, index]
            ids = tree.query(query[None], k=K, return_distance=False)[0]
            used[ids] += 1
            used[index] += 100
            queries[b, q] = query
            indices[b, q] = ids
    return queries, indices
