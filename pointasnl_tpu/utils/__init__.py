"""Framework utilities: config round-trip, logging."""

from pointasnl_tpu.utils.config import load_args, save_args, snapshot_sources
from pointasnl_tpu.utils.logging import Logger

__all__ = ["Logger", "load_args", "save_args", "snapshot_sources"]
