"""Per-host segregation of the persistent XLA:CPU compilation cache.

The jax compilation-cache key does NOT include the host's CPU features, and
XLA:CPU AOT results compiled on a machine with different ISA extensions abort
at load/execute time (observed: a VM swap left `+prefer-no-scatter` entries
that SIGILL'd the thunk executor). Every CPU-backend consumer of a persistent
cache (tests/conftest.py, __graft_entry__._provision_cpu_devices) must
therefore key the cache directory on a host fingerprint — this module is the
single definition of that fingerprint.

Fingerprint contents (r4, VERDICT item 2): the /proc/cpuinfo `flags` line is
NOT sufficient — XLA targets pseudo-features like `+prefer-no-gather` chosen
from the CPU *model*, not its flag list, and round 3's dryrun loaded foreign
AOT entries ("could lead to SIGILL") from a flag-identical host of a
different model. Nor is the `model name` line: virtualized hosts report a
generic string ("Intel(R) Xeon(R) Processor @ 2.10GHz") shared across
microarchitectures, while LLVM's host detection keys off CPUID
family/model/stepping — r4 still saw foreign `+prefer-no-scatter` entries
load inside a flags+model-name-identical cache dir. The fingerprint is
therefore flags + every CPUID-identity line (`vendor_id`, `cpu family`,
`model`, `model name`, `stepping`, `microcode` — the gather/scatter
mitigation tunings depend on the microcode revision) + jaxlib version
(serialization format changes across releases).

This module must stay importable before jax backend init. Importing
`jaxlib.version` is safe (no backend is created); if even that import fails
the version component degrades to "unknown" rather than erroring.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _jaxlib_version() -> str:
    try:
        import jaxlib.version

        return jaxlib.version.__version__
    except Exception:
        return "unknown"


def host_fingerprint(cpuinfo_text: str | None = None,
                     jaxlib_version: str | None = None) -> str:
    """12-hex-char tag of this host's CPU identity (flags + model name) and
    the jaxlib version. Arguments exist for tests; production callers pass
    none and get the live host's fingerprint."""
    if cpuinfo_text is None:
        try:
            with open("/proc/cpuinfo") as f:
                cpuinfo_text = f.read()
        except OSError:
            cpuinfo_text = platform.machine()
    fields: dict[str, str] = {}
    for line in cpuinfo_text.splitlines():
        name, sep, value = line.partition(":")
        if sep:
            fields.setdefault(name.strip(), value.strip())
    flags = fields.get("flags", cpuinfo_text)
    identity = [
        f"{name}:{fields.get(name, '')}"
        for name in (
            "vendor_id", "cpu family", "model", "model name",
            "stepping", "microcode",
        )
    ]
    if jaxlib_version is None:
        jaxlib_version = _jaxlib_version()
    key = "\n".join([flags, *identity, jaxlib_version])
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def host_cache_dir(base_dir: str) -> str:
    """The per-host subdirectory of `base_dir` to hand to
    `jax.config.update("jax_compilation_cache_dir", ...)` for CPU backends."""
    return os.path.join(base_dir, host_fingerprint())


def enable_persistent_cache(base_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at a per-host directory.

    Call before backend init (jax.config updates only; nothing is created
    eagerly). Without this, every CLI run cold-compiles its full models —
    ~10-40 min per executable through this environment's remote TPU compile
    service (r5: the scaled KITTI validation paid that twice back to back).
    TPU executables are serialized host-independently, but the directory is
    fingerprint-segregated anyway so an eventual CPU-backend run in the same
    process tree cannot load cross-ISA XLA:CPU AOT entries (the SIGILL
    class this module exists to prevent).

    base_dir defaults to $POINTASNL_CACHE_DIR or ~/.cache/pointasnl_tpu/jax;
    set POINTASNL_NO_CACHE=1 to disable. Returns the directory used ('' when
    disabled).
    """
    if os.environ.get("POINTASNL_NO_CACHE"):
        return ""
    if base_dir is None:
        base_dir = os.environ.get("POINTASNL_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "pointasnl_tpu", "jax"
        )
    import jax

    # Respect a cache the embedding process already configured (the test
    # suite's conftest, bench.py, the dryrun): a mid-process override would
    # split one run's entries across directories.
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    cache_dir = host_cache_dir(base_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
