"""Host fingerprint for the persistent XLA:CPU AOT cache (utils/cache.py).

Round-3 postmortem (VERDICT r3 item 2): a flags-only fingerprint let a
flag-identical host of a different CPU *model* load foreign AOT entries
compiled with `+prefer-no-gather` pseudo-features ("could lead to SIGILL").
The fingerprint must therefore separate hosts by model name and by jaxlib
version, not only by the cpuinfo flags line.
"""

import os

from pointasnl_tpu.utils import cache

FLAGS = "flags\t\t: fpu vme de pse tsc msr avx2 avx512f"
MODEL_A = "model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz"
MODEL_B = "model name\t: Intel(R) Xeon(R) Platinum 8481C CPU @ 2.70GHz"


def _cpuinfo(model: str, flags: str = FLAGS) -> str:
    return f"processor\t: 0\n{model}\n{flags}\n"


def test_same_inputs_same_fingerprint():
    a = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.0")
    b = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.0")
    assert a == b
    assert len(a) == 12 and all(c in "0123456789abcdef" for c in a)


def test_same_flags_different_model_disjoint():
    # The r3 failure class: identical flags, different model -> different
    # XLA pseudo-feature selection -> must land in disjoint cache dirs.
    a = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.0")
    b = cache.host_fingerprint(_cpuinfo(MODEL_B), jaxlib_version="0.9.0")
    assert a != b


def test_different_flags_disjoint():
    a = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.0")
    b = cache.host_fingerprint(
        _cpuinfo(MODEL_A, flags=FLAGS + " amx-bf16"), jaxlib_version="0.9.0"
    )
    assert a != b


def test_same_model_name_different_cpuid_disjoint():
    # The r4 failure class: virtualized hosts share a GENERIC model-name
    # string across microarchitectures, but LLVM host detection (and the
    # gather/scatter mitigation tunings) key off CPUID family/model/stepping
    # and the microcode revision — each must separate the cache dirs.
    base = (
        "processor\t: 0\nvendor_id\t: GenuineIntel\ncpu family\t: 6\n"
        "model\t\t: {model}\n{name}\nstepping\t: {step}\n"
        "microcode\t: {ucode}\n{flags}\n"
    )
    a = cache.host_fingerprint(
        base.format(model=207, name=MODEL_A, step=2, ucode="0x1", flags=FLAGS),
        jaxlib_version="0.9.0",
    )
    for model, step, ucode in ((143, 2, "0x1"), (207, 4, "0x1"),
                               (207, 2, "0x2b000620")):
        b = cache.host_fingerprint(
            base.format(model=model, name=MODEL_A, step=step, ucode=ucode,
                        flags=FLAGS),
            jaxlib_version="0.9.0",
        )
        assert a != b, (model, step, ucode)


def test_different_jaxlib_disjoint():
    a = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.0")
    b = cache.host_fingerprint(_cpuinfo(MODEL_A), jaxlib_version="0.9.1")
    assert a != b


def test_host_cache_dir_is_fingerprint_subdir():
    d = cache.host_cache_dir("/tmp/base")
    assert os.path.dirname(d) == "/tmp/base"
    assert os.path.basename(d) == cache.host_fingerprint()


def test_live_fingerprint_uses_real_jaxlib():
    # The live path must not degrade to "unknown" in this environment.
    assert cache._jaxlib_version() != "unknown"


def test_enable_persistent_cache_respects_existing(tmp_path, monkeypatch):
    """cli/__init__ enables the persistent cache by default, but must never
    override a cache the embedding process already configured (the suite's
    conftest does, here) — a mid-process switch would split one run's
    entries across directories."""
    import jax

    from pointasnl_tpu.utils import cache

    before = jax.config.jax_compilation_cache_dir
    assert before  # conftest configured one
    got = cache.enable_persistent_cache(str(tmp_path / "other"))
    assert got == before
    assert jax.config.jax_compilation_cache_dir == before
    # opt-out env is honored
    monkeypatch.setenv("POINTASNL_NO_CACHE", "1")
    assert cache.enable_persistent_cache(str(tmp_path / "x")) == ""
