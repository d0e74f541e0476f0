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


def labeled_surface_scene(
    rng: np.random.RandomState,
    n: int,
    extent: float = 3.0,
    noise: float = 0.008,
):
    """One surface scene with GEOMETRY-DETERMINED semantic labels.

    Returns (points (n,3) f32, labels (n,) i32) with ScanNet-convention ids:
    floor=2, wall=1, furniture boxes=3 ('chair'). Labels are a deterministic
    function of which surface a point lies on, so a segmentation model can
    actually learn them — the basis of the seg-pipeline recipe e2e
    (tests/test_recipe_seg_e2e.py), which needs synthetic data where mIoU
    well above chance is achievable, unlike random labels.
    """
    planes = [
        (2, np.array([0, 0, 0.0]), np.array([extent, 0, 0.0]), np.array([0, extent, 0.0])),
        (1, np.array([0, 0, 0.0]), np.array([extent, 0, 0.0]), np.array([0, 0, extent * 0.6])),
        (1, np.array([0, 0, 0.0]), np.array([0, extent, 0.0]), np.array([0, 0, extent * 0.6])),
    ]
    for _ in range(rng.randint(3, 6)):  # furniture boxes
        c = np.array([rng.rand() * extent * 0.7, rng.rand() * extent * 0.7, 0.0])
        size = 0.25 + rng.rand(3) * 0.45
        planes.append((3, c, np.array([size[0], 0, 0]), np.array([0, size[1], 0])))
        planes.append((3, c + np.array([0, 0, size[2]]),
                       np.array([size[0], 0, 0]), np.array([0, size[1], 0])))
        planes.append((3, c, np.array([size[0], 0, 0]), np.array([0, 0, size[2]])))
        planes.append((3, c, np.array([0, size[1], 0]), np.array([0, 0, size[2]])))
    areas = np.array([np.linalg.norm(np.cross(u, v)) for _, _, u, v in planes])
    edges = np.round(np.cumsum(areas) / areas.sum() * n).astype(int)
    counts = np.diff(edges, prepend=0)
    pts, labs = [], []
    for (lab, o, u, v), c in zip(planes, counts):
        uv = rng.rand(c, 2)
        pts.append(o + uv[:, :1] * u + uv[:, 1:] * v)
        labs.append(np.full(c, lab, np.int32))
    cloud = np.concatenate(pts)[:n] + rng.randn(n, 3) * noise
    labels = np.concatenate(labs)[:n]
    order = rng.permutation(n)
    return cloud[order].astype(np.float32), labels[order]
