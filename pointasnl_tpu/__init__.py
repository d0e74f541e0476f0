"""PointASNL-TPU: a TPU-native (JAX/XLA/Pallas/pjit) point-cloud deep-learning framework.

Re-implements the full capability surface of PointASNL (CVPR 2020) — adaptive
sampling + local-nonlocal set abstraction over point clouds, with classification
(ModelNet40) and semantic segmentation (ScanNet v2, SemanticKITTI) workloads —
as an idiomatic JAX framework:

- ``pointasnl_tpu.ops``      — geometry primitives (FPS, kNN, ball query, grouping,
  three-NN interpolation) as fixed-shape, differentiable, jit-compatible functions
  with Pallas TPU kernels for the hot paths.
- ``pointasnl_tpu.nn``       — Flax modules for the PointASNL / PointNet++ layer zoo.
- ``pointasnl_tpu.models``   — the three model families (cls / sem_seg / sem_seg_res).
- ``pointasnl_tpu.data``     — dataset pipelines and augmentations.
- ``pointasnl_tpu.train``    — train state, schedules, loops, checkpointing, metrics.
- ``pointasnl_tpu.parallel`` — device-mesh sharding (DP via pjit + XLA collectives).

The reference implementation this framework is feature-matched against lives at
yanx27/PointASNL (TF1.13 + CUDA custom ops); file:line citations in docstrings
point into that repo for behavioral parity checks.
"""

__version__ = "0.1.0"
