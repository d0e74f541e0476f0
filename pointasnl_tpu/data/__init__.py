"""Dataset pipelines: augmentations, ModelNet40, ScanNet, SemanticKITTI.

Host-side numpy pipelines emitting fixed-shape batches (TPU-friendly static
shapes), mirroring the reference's L4 layer (SURVEY.md §2.4). Heavy
preprocessing (grid subsampling) has a C++ extension with a numpy fallback.
"""

from pointasnl_tpu.data import provider
from pointasnl_tpu.data.modelnet import ModelNetDataset

__all__ = ["ModelNetDataset", "provider"]
