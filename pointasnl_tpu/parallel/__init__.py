"""Device-mesh parallelism: mesh construction, batch sharding, replication.

The reference is single-process single-GPU (SURVEY.md §2.9); this subsystem is
the new first-class TPU-native design: a 1-D (or 2-D) jax.sharding.Mesh with
pjit-partitioned steps, XLA collectives over ICI for gradient/BN reductions,
and DCN via jax.distributed for multi-host scale-out.
"""

from pointasnl_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    setup_data_parallel,
    shard_batch,
)
from pointasnl_tpu.parallel.sharded_knn import (
    farthest_point_sample_sharded,
    knn_point_query_sharded,
    knn_point_sharded,
)
from pointasnl_tpu.parallel.whole_scene import (
    make_scan_train_step_sharded,
    make_scene_train_step_sharded,
    predict_scan_sharded,
    predict_scene_sharded,
    scan_apply_sharded,
    scene_apply_sharded,
)

__all__ = [
    "batch_sharding",
    "farthest_point_sample_sharded",
    "knn_point_query_sharded",
    "knn_point_sharded",
    "make_mesh",
    "make_scan_train_step_sharded",
    "make_scene_train_step_sharded",
    "predict_scan_sharded",
    "predict_scene_sharded",
    "replicate",
    "scan_apply_sharded",
    "scene_apply_sharded",
    "setup_data_parallel",
    "shard_batch",
]
