"""Model zoo: the three PointASNL families + a name registry.

The registry mirrors the reference's `importlib.import_module(FLAGS.model)`
driver convention (train.py:57): models are selected by the same names
('pointasnl_cls', 'pointasnl_sem_seg', 'pointasnl_sem_seg_res').
"""

from pointasnl_tpu.models.cls import PointASNLCls
from pointasnl_tpu.models.sem_seg import PointASNLSemSeg
from pointasnl_tpu.models.sem_seg_res import PointASNLSemSegRes
from pointasnl_tpu.models.registry import get_model_class, register_model, MODEL_REGISTRY

__all__ = [
    "MODEL_REGISTRY",
    "PointASNLCls",
    "PointASNLSemSeg",
    "PointASNLSemSegRes",
    "get_model_class",
    "register_model",
]
