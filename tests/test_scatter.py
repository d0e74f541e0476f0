"""One-hot-matmul scatter-add (ops/scatter.py) vs the autodiff scatter."""

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
    got = onehot_scatter_add(dout, idx, N, chunk=256)
    want = jnp.zeros((B, N, C)).at[jnp.arange(B)[:, None], idx].add(dout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


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
    np.testing.assert_allclose(
        np.asarray(vjp_mxu(dout)[0]), np.asarray(vjp_ref(dout)[0]), atol=1e-5
    )


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
    np.testing.assert_allclose(
        np.asarray(vjp_mxu(dout)[0]), np.asarray(vjp_ref(dout)[0]), atol=1e-5
    )


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
    np.testing.assert_allclose(
        np.asarray(dres), np.asarray(vjp_ref(jnp.ones_like(out))[0]), atol=1e-5
    )
