"""Geometry op layer: jnp reference implementations + Pallas TPU kernels.

The public API is backend-agnostic; `pointasnl_tpu.ops.dispatch` selects the
Pallas kernels on TPU where they win, and the always-correct jnp versions
elsewhere (CPU tests, interpret mode).
"""

from pointasnl_tpu.ops.dispatch import (
    farthest_point_sample,
    gather_point,
    group_point,
    grouping,
    knn_point,
    pairwise_sqdist,
    prob_sample,
    query_ball_point,
    repulsion_loss,
    sampling,
    three_interpolate,
    three_interpolate_idw,
    three_nn,
)

__all__ = [
    "farthest_point_sample",
    "gather_point",
    "group_point",
    "grouping",
    "knn_point",
    "pairwise_sqdist",
    "prob_sample",
    "query_ball_point",
    "repulsion_loss",
    "sampling",
    "three_interpolate",
    "three_interpolate_idw",
    "three_nn",
]
