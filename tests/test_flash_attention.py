"""Flash attention kernel (interpret mode) vs dense attention + its gradient."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointasnl_tpu.ops.pallas.flash_attention import flash_attention
from tests.test_blockwise import dense_attention, make_qkv


@pytest.mark.parametrize("M,N", [(16, 256), (128, 128), (100, 200)])
def test_flash_matches_dense(rng, M, N):
    q, k, v = make_qkv(rng, B=2, M=M, N=N, C=8, D=12)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v))
    want = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_unscaled(rng):
    q, k, v = make_qkv(rng, B=1, M=8, N=64, C=4, D=4)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, False))
    want = np.asarray(dense_attention(q, k, v, scaled=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_dense(rng):
    q, k, v = make_qkv(rng, B=1, M=8, N=64, C=4, D=4)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def f_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("M,N", [(200, 300), (128, 128)])
def test_flash_pallas_backward_matches_dense(rng, M, N):
    """The hand-written Pallas backward (dQ per tile; dK/dV accumulated across
    revisited output blocks) vs jax.grad of dense attention — including an
    M-padding case (200 -> 256) where zero dO rows must contribute nothing."""
    q, k, v = make_qkv(rng, B=2, M=M, N=N, C=8, D=12)
    ct = jnp.asarray(np.random.RandomState(3).randn(2, M, 12).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * ct)

    def f_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) * ct)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_dense):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=f"d{name}"
        )


def test_fits_vmem_measured_envelope():
    """Pin the fits_vmem guard to the probe measurements
    (scripts/probe_flash_vmem.py, BENCH_OPS.md 'flash-attention VMEM
    envelope'): the wide (>=128-lane) class is capped in BYTES anchored at
    the measured c=d=128 boundary, so doubling c/d must halve the admitted
    npad rather than keep it (the r3 review's failure scenario: a C=512
    layer4 NL at npad 8192-12288 admitted by an unscaled npad cap would
    crash the remote compile instead of routing to blockwise)."""
    from pointasnl_tpu.ops.pallas import flash_attention as fa

    # c=d=128: measured pass at 14336, fail at 16384; guard margin at 12288.
    assert fa.fits_vmem(12288, 128, 128)
    assert not fa.fits_vmem(12289, 128, 128)
    # c=d=256 carries 2x the bytes/row: the cap must shrink accordingly.
    assert fa.fits_vmem(6144, 256, 256)
    assert not fa.fits_vmem(8192, 256, 256)
    # Small-c lane classes are governed by the physical-bytes cap alone
    # (c=d=32 measured fail at 65536; both operands lane-pad to 128).
    assert fa.fits_vmem(32768, 32, 32)
    assert not fa.fits_vmem(65536, 32, 32)
