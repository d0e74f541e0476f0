"""Host-side kNN helpers (the nearest_neighbors library surface).

The model path uses the on-device ops.knn_point (the tf.py_func host round
trip is gone — SURVEY.md §2.1 note). These helpers keep the host-side API the
reference exported for data tooling:

  - knn / knn_batch: exact kNN (sklearn KDTree instead of nanoflann);
  - knn_batch_distance_pick: coverage-aware query sampling
    (utils/nearest_neighbors/knn_.cxx:138-271 semantics: repeatedly pick a
    random least-used point, take its K nearest, bump their usage counters,
    heavily penalize re-picking the query itself).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def knn(pts: np.ndarray, queries: np.ndarray, K: int, omp: bool = False) -> np.ndarray:
    """Exact kNN of queries within one cloud: (N, 3), (M, 3) -> (M, K) int64."""
    from sklearn.neighbors import KDTree

    tree = KDTree(pts, leaf_size=10)
    return tree.query(queries, k=K, return_distance=False).astype(np.int64)


def knn_batch(pts: np.ndarray, queries: np.ndarray, K: int, omp: bool = False) -> np.ndarray:
    """Batched exact kNN: (B, N, 3), (B, M, 3) -> (B, M, K) int64."""
    return np.stack([knn(pts[b], queries[b], K) for b in range(pts.shape[0])])


def knn_batch_distance_pick(
    pts: np.ndarray,
    nqueries: int,
    K: int,
    omp: bool = False,
    random_state: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Coverage-aware query sampling + kNN.

    Returns (queries (B, nqueries, 3), indices (B, nqueries, K)). Each round
    picks a random point among those with the minimal usage count, queries its
    K nearest neighbors, increments their counters, and adds +100 to the
    picked point so it is effectively never re-picked.
    """
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
