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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives run one rendezvous across the 8 virtual devices'
# threads with a 40 s TERMINATE timeout — on this 1-core host a slow
# scheduling round can keep a participant away longer, and the runtime
# then CHECK-kills the whole process ("Exiting to ensure a consistent
# program state", rendezvous.cc:127; bisected r5 from three 'Fatal Python
# error: Aborted' suite runs inside sharded-path fetches). Raise both
# rendezvous timeouts far above single-core scheduling jitter.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Synchronous CPU dispatch: with async dispatch, executions of
# collective-bearing programs can interleave on the shared device thread
# pool and deadlock the rendezvous NONDETERMINISTICALLY (r5: a solo suite
# run froze ~20 min inside a sharded-path fetch with zero CPU across all
# threads — a true deadlock, distinct from the oversubscription livelock
# documented in CLAUDE.md). Sync dispatch serializes executions; the DP/
# sharded tests measure correctness, not dispatch overlap.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# Persistent compilation cache: the e2e CLI tests compile full models; caching
# makes repeat suite runs dramatically faster. Segregated per host fingerprint
# (why: pointasnl_tpu/utils/cache.py — cross-ISA AOT entries SIGILL).
from pointasnl_tpu.utils.cache import host_cache_dir  # noqa: E402

_cache_dir = host_cache_dir(os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# NOTE (r5): do NOT add an autouse jax.clear_caches() between modules.
# It was tried to bound the one-process RSS of ~100 compiled executables
# and produced a DETERMINISTIC 'Fatal Python error: Aborted' inside the
# next sharded-path buffer fetch (test_cli_kitti --sharded), reproducible
# on an idle machine and absent without the fixture. The original
# once-in-a-run abort it was meant to fix correlates with concurrent
# heavyweight processes starving the 8-virtual-device collectives
# (CLAUDE.md: serialize the suite with other heavy runs).
