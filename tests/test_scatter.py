"""One-hot-matmul scatter-add (ops/scatter.py) vs the autodiff scatter.

Precision tiers (ops/scatter.py onehot_scatter_add): the default "split2"
(bf16 one-hot reused across two passes over the cotangents' bf16 hi/lo
halves) is exact to ~eps_bf16^2 ~ 1.5e-5 relative; Precision.HIGHEST is
f32-exact and used as the tight oracle tier here.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.ops import geometry as g
from pointasnl_tpu.ops.scatter import (
    gather_point_mxu,
    group_point_mxu,
    onehot_scatter_add,
)


def test_onehot_scatter_add_matches_indexed_add(rng):
    B, MK, N, C = 2, 700, 97, 5  # ragged MK exercises the pad-with-N path
    dout = jnp.asarray(rng.randn(B, MK, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, MK)).astype(np.int32))
    want = jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], idx].add(dout)
    got_hi = onehot_scatter_add(dout, idx, N, chunk=256,
                                precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got_hi), np.asarray(want), atol=1e-5)
    # default split2 tier: second-order bf16 split error, ~1.5e-5 relative
    got_s2 = onehot_scatter_add(dout, idx, N, chunk=256)
    scale = np.abs(np.asarray(want)).max()
    assert np.abs(np.asarray(got_s2) - np.asarray(want)).max() < 1e-4 * scale


def test_onehot_scatter_add_wide_channels(rng):
    # C >= 128 takes the natural (N, C)-output form (no final transpose);
    # narrow C takes the lane-transposed form — both must match the oracle.
    B, MK, N, C = 2, 300, 50, 130
    dout = jnp.asarray(rng.randn(B, MK, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, MK)).astype(np.int32))
    want = jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], idx].add(dout)
    got_hi = onehot_scatter_add(dout, idx, N, chunk=128,
                                precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got_hi), np.asarray(want), atol=1e-5)
    got_s2 = onehot_scatter_add(dout, idx, N, chunk=128)
    scale = np.abs(np.asarray(want)).max()
    assert np.abs(np.asarray(got_s2) - np.asarray(want)).max() < 1e-4 * scale


def test_group_point_mxu_forward_and_grad(rng):
    B, N, M, K, C = 2, 64, 48, 8, 6
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M, K)).astype(np.int32))
    dout = jnp.asarray(rng.randn(B, M, K, C).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(group_point_mxu(pts, idx)), np.asarray(g.group_point(pts, idx))
    )
    _, vjp_ref = jax.vjp(lambda p: g.group_point(p, idx), pts)
    _, vjp_mxu = jax.vjp(lambda p: group_point_mxu(p, idx), pts)
    got, want = np.asarray(vjp_mxu(dout)[0]), np.asarray(vjp_ref(dout)[0])
    # default split2 tier on the custom VJPs: ~1.5e-5-relative of scale
    assert np.abs(got - want).max() < 1e-4 * max(np.abs(want).max(), 1.0)


def test_gather_point_mxu_forward_and_grad(rng):
    B, N, M, C = 2, 80, 33, 4
    pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M)).astype(np.int32))
    dout = jnp.asarray(rng.randn(B, M, C).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(gather_point_mxu(pts, idx)), np.asarray(g.gather_point(pts, idx))
    )
    _, vjp_ref = jax.vjp(lambda p: g.gather_point(p, idx), pts)
    _, vjp_mxu = jax.vjp(lambda p: gather_point_mxu(p, idx), pts)
    got, want = np.asarray(vjp_mxu(dout)[0]), np.asarray(vjp_ref(dout)[0])
    # default split2 tier on the custom VJPs: ~1.5e-5-relative of scale
    assert np.abs(got - want).max() < 1e-4 * max(np.abs(want).max(), 1.0)


def test_dispatch_routes_mxu_grad_on_pallas_backend(rng):
    """With the backend forced to 'pallas', ops.group_point carries the
    one-hot backward (and stays numerically equal to the oracle)."""
    from pointasnl_tpu.ops import dispatch

    pts = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 32, (1, 16, 4)).astype(np.int32))
    with dispatch.ops_backend("pallas"):
        out, vjp = jax.vjp(lambda p: dispatch.group_point(p, idx), pts)
        dres = vjp(jnp.ones_like(out))[0]
    _, vjp_ref = jax.vjp(lambda p: g.group_point(p, idx), pts)
    want = np.asarray(vjp_ref(jnp.ones_like(out))[0])
    assert np.abs(np.asarray(dres) - want).max() < 1e-4 * max(np.abs(want).max(), 1.0)
