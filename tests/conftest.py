"""Test configuration: run on a virtual 8-device CPU mesh.

The ambient environment may register a TPU PJRT plugin via sitecustomize and
pin JAX_PLATFORMS to it; env vars alone therefore aren't enough. We import jax
here (before any backend is initialized) and force the CPU platform plus 8
virtual host devices — this is how multi-device sharding is tested without a
TPU slice (SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the e2e CLI tests compile full models; caching
# makes repeat suite runs dramatically faster. The cache key does NOT include
# the host's CPU features, and XLA:CPU AOT results compiled on a machine with
# different ISA extensions abort at load/execute time (observed: a VM swap left
# `+prefer-no-scatter` entries that SIGILL'd the thunk executor) — so segregate
# caches per host fingerprint.
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _cpu_flags = next(
            (line for line in f if line.startswith("flags")), platform.machine()
        )
except OSError:
    _cpu_flags = platform.machine()
_host_tag = hashlib.sha1(_cpu_flags.encode()).hexdigest()[:12]
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache", _host_tag)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
