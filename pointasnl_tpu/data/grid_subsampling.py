"""Voxel-grid subsampling: barycenter of points/features, majority-vote labels.

Behavioral parity with utils/cpp_wrappers/cpp_subsampling (grid_subsampling.cpp:5-106):
  - voxel origin = floor(min_corner / sampleDl) * sampleDl;
  - each voxel emits the barycenter of its points and features;
  - labels take the per-voxel majority (per label column).
Output voxel ORDER differs from the reference (unordered_map iteration there,
sorted voxel id here) — downstream consumers rebuild KD-trees, so order is not
semantically meaningful; ours is deterministic, which the reference's is not.

Two backends: a C++ extension (pointasnl_tpu.native, built offline via
setup.py — this is host-side preprocessing over ragged clouds, not a device
kernel) and a vectorized numpy fallback with identical outputs up to voxel
order. `compute()` keeps the reference wrapper's keyword surface
(wrapper.cpp kwlist: points, features, classes, sampleDl, method, verbose).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # optional C++ extension (see pointasnl_tpu/native)
    from pointasnl_tpu.native import grid_subsampling_ext as _ext
except Exception:  # pragma: no cover - exercised when ext is not built
    _ext = None


def _numpy_grid_subsampling(points, features, classes, sampleDl):
    points = np.ascontiguousarray(points, dtype=np.float32)
    N = points.shape[0]
    origin = np.floor(points.min(axis=0) / sampleDl) * sampleDl
    coords = np.floor((points - origin) / sampleDl).astype(np.int64)
    dims = coords.max(axis=0) + 1
    keys = coords[:, 0] + dims[0] * coords[:, 1] + dims[0] * dims[1] * coords[:, 2]

    uniq, inverse, counts = np.unique(keys, return_inverse=True, return_counts=True)
    V = len(uniq)

    sub_points = np.zeros((V, 3), np.float64)
    for d in range(3):
        sub_points[:, d] = np.bincount(inverse, weights=points[:, d], minlength=V)
    sub_points /= counts[:, None]
    sub_points = sub_points.astype(np.float32)

    sub_features = None
    if features is not None:
        features = np.ascontiguousarray(features, dtype=np.float32)
        F = features.shape[1]
        sub_features = np.zeros((V, F), np.float64)
        for d in range(F):
            sub_features[:, d] = np.bincount(inverse, weights=features[:, d], minlength=V)
        sub_features = (sub_features / counts[:, None]).astype(np.float32)

    sub_classes = None
    if classes is not None:
        classes = np.asarray(classes)
        squeeze = classes.ndim == 1
        if squeeze:
            classes = classes[:, None]
        L = classes.shape[1]
        sub_classes = np.zeros((V, L), np.int32)
        for d in range(L):
            col = classes[:, d].astype(np.int64)
            # Majority vote per voxel: count (voxel, label) pairs, then take
            # the label with the max count per voxel (ties -> smaller label,
            # deterministic; the reference's unordered_map tie-break is not).
            labs, lab_inv = np.unique(col, return_inverse=True)
            pair = inverse * len(labs) + lab_inv
            pair_counts = np.bincount(pair, minlength=V * len(labs)).reshape(V, len(labs))
            sub_classes[:, d] = labs[np.argmax(pair_counts, axis=1)]
        if squeeze:
            sub_classes = sub_classes[:, 0]
    return sub_points, sub_features, sub_classes


def compute(
    points: np.ndarray,
    features: Optional[np.ndarray] = None,
    classes: Optional[np.ndarray] = None,
    sampleDl: float = 0.1,
    method: str = "barycenters",
    verbose: int = 0,
):
    """Grid-subsample a cloud. Returns the same tuple shape as the reference
    wrapper: points, (features,) (classes,) depending on the inputs given."""
    if method != "barycenters":
        raise ValueError(f"unsupported method {method!r} (reference supports barycenters)")

    if _ext is not None:
        return _ext.compute(
            points, features=features, classes=classes, sampleDl=sampleDl, verbose=verbose
        )

    sub_points, sub_features, sub_classes = _numpy_grid_subsampling(
        points, features, classes, sampleDl
    )
    out = [sub_points]
    if features is not None:
        out.append(sub_features)
    if classes is not None:
        out.append(sub_classes)
    return out[0] if len(out) == 1 else tuple(out)


# Alias matching the reference import name
# (`grid_subsampling.compute(...)`, ScanNet/scannet_dataset_grid.py usage).
grid_subsampling = compute
