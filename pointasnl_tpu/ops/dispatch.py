"""Backend dispatch for geometry ops.

Two backends share one API:
  - "jnp":    pure jax.numpy reference implementations (always correct,
              differentiable, run anywhere) — pointasnl_tpu.ops.geometry.
  - "pallas": hand-tiled TPU kernels for the hot ops (FPS, kNN with
              resident/spatial/streaming routing, ball query) —
              pointasnl_tpu.ops.pallas.

Selection:
  - default "auto": pallas on TPU backends, jnp elsewhere;
  - env var POINTASNL_OPS_BACKEND={auto,jnp,pallas} overrides;
  - `with ops_backend("jnp"): ...` overrides locally (used by tests to
    cross-check kernels against the oracle).
"""

from __future__ import annotations

import contextlib
import os
import threading

import jax
import jax.numpy as jnp

from pointasnl_tpu.ops import geometry as _g

_state = threading.local()


def _default_backend() -> str:
    return os.environ.get("POINTASNL_OPS_BACKEND", "auto")


def current_backend() -> str:
    return getattr(_state, "backend", None) or _default_backend()


@contextlib.contextmanager
def ops_backend(name: str):
    """Locally force the ops backend ("jnp", "pallas", or "auto")."""
    prev = getattr(_state, "backend", None)
    _state.backend = name
    try:
        yield
    finally:
        _state.backend = prev


def _on_tpu() -> bool:
    try:
        # "axon" is a tunneled TPU platform; treat it as TPU.
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _use_pallas() -> bool:
    backend = current_backend()
    if backend == "jnp":
        return False
    if backend == "pallas":
        return True
    return _on_tpu()


# Ops with no Pallas specialization — re-exported directly.
pairwise_sqdist = _g.pairwise_sqdist
prob_sample = _g.prob_sample


def gather_point(points, idx):
    # On TPU the scatter-add VJP of a gather is ~30-80x slower than the
    # one-hot MXU matmul form (ops/scatter.py — measured numbers there);
    # forward values are identical either way.
    if _use_pallas():
        from pointasnl_tpu.ops.scatter import gather_point_mxu

        return gather_point_mxu(points, idx)
    return _g.gather_point(points, idx)


gather_point.__doc__ = _g.gather_point.__doc__


def group_point(points, idx):
    if _use_pallas():
        from pointasnl_tpu.ops.scatter import group_point_mxu

        return group_point_mxu(points, idx)
    return _g.group_point(points, idx)


group_point.__doc__ = _g.group_point.__doc__


def three_interpolate(points, idx, weight):
    return _g.three_interpolate(points, idx, weight, group_point_fn=group_point)


three_interpolate.__doc__ = _g.three_interpolate.__doc__


def repulsion_loss(pred, nsample: int = 20, radius: float = 0.07, h: float = 0.03):
    return _g.repulsion_loss(
        pred, nsample=nsample, radius=radius, h=h,
        ball_query_fn=query_ball_point, group_point_fn=group_point,
    )


repulsion_loss.__doc__ = _g.repulsion_loss.__doc__


def farthest_point_sample(npoint, xyz):
    if _use_pallas():
        try:
            from pointasnl_tpu.ops.pallas import fps as _pfps
        except ImportError:
            pass
        else:
            return _pfps.farthest_point_sample(npoint, xyz)
    return _g.farthest_point_sample(npoint, xyz)


farthest_point_sample.__doc__ = _g.farthest_point_sample.__doc__


def knn_point(k, support, query):
    # XLA's top_k/sort lowering dominates whole train steps on this hardware
    # (sustained fetch-forced timing, BENCH_OPS.md: seg step 996 ms with the
    # top_k path vs ~75 ms with the kernels), so "auto" on TPU uses the
    # Pallas kernels (sort-free min-extraction; resident scan to
    # knn.RESIDENT_MAX_N (12288), Morton/sphere-pruned spatial kernel to
    # N=2097152 (two-level visit ordering past 524288), streaming beyond).
    if _use_pallas():
        try:
            from pointasnl_tpu.ops.pallas import knn as _pknn
        except ImportError:
            pass
        else:
            return _pknn.knn_point(k, support, query)
    return _g.knn_point(k, support, query)


knn_point.__doc__ = _g.knn_point.__doc__


def query_ball_point(radius, nsample, xyz, new_xyz):
    if _use_pallas():
        try:
            from pointasnl_tpu.ops.pallas import ball_query as _pball
        except ImportError:
            pass
        else:
            return _pball.query_ball_point(radius, nsample, xyz, new_xyz)
    return _g.query_ball_point(radius, nsample, xyz, new_xyz)


query_ball_point.__doc__ = _g.query_ball_point.__doc__


def three_nn(xyz1, xyz2):
    # k=3 special case of the kNN kernel; gradient is blocked either way
    # (the reference blocks it too, tf_interpolate.py:18).
    if _use_pallas() and xyz2.shape[1] >= 3:
        try:
            from pointasnl_tpu.ops.pallas import knn as _pknn
        except ImportError:
            pass
        else:
            dist2, idx = _pknn.knn_point(3, xyz2, xyz1)
            return jax.lax.stop_gradient(dist2), idx
    return _g.three_nn(xyz1, xyz2)


three_nn.__doc__ = _g.three_nn.__doc__


def three_interpolate_idw(xyz1, xyz2, points2):
    # one weight-numerics body (geometry), search injected per backend
    return _g.three_interpolate_idw(
        xyz1, xyz2, points2, three_nn_fn=three_nn, group_point_fn=group_point
    )


three_interpolate_idw.__doc__ = _g.three_interpolate_idw.__doc__


def sampling(npoint, pts, feature=None):
    """FPS + gather (see geometry.sampling); FPS goes through dispatch."""
    fps_idx = farthest_point_sample(npoint, pts)
    if feature is None:
        return gather_point(pts, fps_idx)
    return gather_point(pts, fps_idx), gather_point(feature, fps_idx)


def grouping(feature, k, src_xyz, q_xyz, *, use_xyz=True, use_knn=True,
             radius=0.2, idx=None):
    """Neighborhood grouping (see geometry.grouping); the neighbor search
    goes through dispatch, the gather/concat through the single geometry
    implementation."""
    if idx is None:
        if use_knn:
            _, idx = knn_point(k, src_xyz, q_xyz)
        else:
            idx, _ = query_ball_point(radius, k, src_xyz, q_xyz)
    return _g.grouping(
        feature, k, src_xyz, q_xyz, use_xyz=use_xyz, idx=idx,
        group_point_fn=group_point,
    )
