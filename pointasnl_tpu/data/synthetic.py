"""Synthetic point-cloud generators for benchmarks and hardware validation.

No dataset ships with the repo (zero-egress build environment), so benches
need stand-ins with realistic GEOMETRY, not just realistic shapes: several
kernels' costs are data-dependent (the spatially-pruned kNN in
ops/pallas/knn_spatial.py prunes by local density — a gaussian blob at crop
scale keeps ~90% of segments where a real indoor scan keeps ~30%,
BENCH_OPS.md). `surface_scene` mimics the reference's ScanNet crops
(scannet_dataset.py:135-300): points sampled on room surfaces (floor +
walls + box furniture) with sensor noise, so density and locality behave
like real scans.
"""

from __future__ import annotations

import numpy as np


def gaussian_cloud(rng: np.random.RandomState, batch: int, n: int) -> np.ndarray:
    """(B, N, 3) float32 standard-normal cloud — the worst case for spatial
    pruning and the historical bench.py distribution."""
    return rng.randn(batch, n, 3).astype(np.float32)


def surface_scene(
    rng: np.random.RandomState,
    batch: int,
    n: int,
    extent: float = 1.5,
    noise: float = 0.008,
) -> np.ndarray:
    """(B, N, 3) float32 clouds sampled on indoor-scan-like surfaces.

    Each scene: a floor plane, two walls, and 2-4 axis-aligned boxes
    ("furniture"), with per-point gaussian sensor noise. Point densities per
    surface are proportional to surface area, like a real range scan.
    """
    out = np.empty((batch, n, 3), np.float32)
    for b in range(batch):
        planes = [
            # (origin, u-axis, v-axis) spans
            (np.array([0, 0, 0.0]), np.array([extent, 0, 0.0]), np.array([0, extent, 0.0])),
            (np.array([0, 0, 0.0]), np.array([extent, 0, 0.0]), np.array([0, 0, extent])),
            (np.array([0, 0, 0.0]), np.array([0, extent, 0.0]), np.array([0, 0, extent])),
        ]
        for _ in range(rng.randint(2, 5)):  # furniture boxes
            c = rng.rand(3) * extent * 0.7
            size = 0.1 + rng.rand(3) * 0.3
            # two visible faces per box
            planes.append((c, np.array([size[0], 0, 0]), np.array([0, size[1], 0])))
            planes.append((c, np.array([size[0], 0, 0]), np.array([0, 0, size[2]])))
        areas = np.array([np.linalg.norm(np.cross(u, v)) for _, u, v in planes])
        # cumulative-rounding allocation: sums to n exactly, never negative
        # (small planes may get 0 points at tiny n, which is fine)
        edges = np.round(np.cumsum(areas) / areas.sum() * n).astype(int)
        counts = np.diff(edges, prepend=0)
        pts = []
        for (o, u, v), c in zip(planes, counts):
            uv = rng.rand(c, 2)
            pts.append(o + uv[:, :1] * u + uv[:, 1:] * v)
        cloud = np.concatenate(pts)[:n]
        cloud = cloud + rng.randn(*cloud.shape) * noise
        rng.shuffle(cloud)
        out[b] = cloud.astype(np.float32)
    return out
