"""CLI train/eval drivers mirroring the reference's 10 entry points.

Importing this package enables jax's persistent compilation cache
(utils/cache.enable_persistent_cache — per-host-fingerprint directory,
default ~/.cache/pointasnl_tpu/jax, opt out with POINTASNL_NO_CACHE=1):
first compiles of the full models take 10-40 minutes through a remote
compile service, and every driver is expected to be re-run (train -> test,
resume, validation sweeps), so an on-disk executable cache is the correct
default for a production CLI surface. The update is config-only and happens
before any backend initialization triggered by the driver bodies.
"""

from pointasnl_tpu.utils.cache import enable_persistent_cache as _epc

_epc()
del _epc
