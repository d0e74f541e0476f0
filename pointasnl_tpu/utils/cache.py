"""Per-host segregation of the persistent XLA:CPU compilation cache.

The jax compilation-cache key does NOT include the host's CPU features, and
XLA:CPU AOT results compiled on a machine with different ISA extensions abort
at load/execute time (observed: a VM swap left `+prefer-no-scatter` entries
that SIGILL'd the thunk executor). Every CPU-backend consumer of a persistent
cache (tests/conftest.py, __graft_entry__._provision_cpu_devices) must
therefore key the cache directory on a host fingerprint — this module is the
single definition of that fingerprint.

This module must stay importable before jax backend init (no jax import).
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """12-hex-char tag of this host's CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            cpu_flags = next(
                (line for line in f if line.startswith("flags")), platform.machine()
            )
    except OSError:
        cpu_flags = platform.machine()
    return hashlib.sha1(cpu_flags.encode()).hexdigest()[:12]


def host_cache_dir(base_dir: str) -> str:
    """The per-host subdirectory of `base_dir` to hand to
    `jax.config.update("jax_compilation_cache_dir", ...)` for CPU backends."""
    return os.path.join(base_dir, host_fingerprint())
