"""Support-sharded kNN/FPS vs the single-device oracles (8-dev CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointasnl_tpu.ops import geometry as g
from pointasnl_tpu.parallel import make_mesh
from pointasnl_tpu.parallel.sharded_knn import (
    farthest_point_sample_sharded,
    knn_point_sharded,
)


@pytest.mark.parametrize("B,N,M,K", [(2, 512, 64, 8), (1, 1024, 128, 16)])
def test_sharded_knn_matches_oracle(rng, B, N, M, K):
    mesh = make_mesh()
    support = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    query = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    got_d, got_i = knn_point_sharded(K, support, query, mesh)
    want_d, want_i = g.knn_point(K, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )


def test_sharded_knn_duplicate_ties(rng):
    """Cross-shard exact ties must resolve to the lower global index."""
    mesh = make_mesh()
    pts = rng.randn(1, 128, 3).astype(np.float32)
    dup = np.concatenate([pts, pts, pts, pts], axis=1)  # ties across shards
    support = jnp.asarray(dup)
    query = jnp.asarray(pts[:, :32])
    got_d, got_i = knn_point_sharded(8, support, query, mesh)
    want_d, want_i = g.knn_point(8, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sharded_knn_rejects_bad_shapes(rng):
    mesh = make_mesh()
    support = jnp.zeros((1, 100, 3))  # not divisible by 8
    with pytest.raises(ValueError, match="divide"):
        knn_point_sharded(4, support, support[:, :10], mesh)
    support = jnp.zeros((1, 64, 3))  # k > N // D
    with pytest.raises(ValueError, match="divide"):
        knn_point_sharded(16, support, support[:, :10], mesh)


@pytest.mark.parametrize("B,N,M", [(2, 512, 64), (1, 256, 32)])
def test_sharded_fps_matches_oracle(rng, B, N, M):
    mesh = make_mesh()
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    got = np.asarray(farthest_point_sample_sharded(M, xyz, mesh))
    want = np.asarray(g.farthest_point_sample(M, xyz))
    np.testing.assert_array_equal(got, want)


def test_sharded_fps_npoint_one(rng):
    mesh = make_mesh()
    xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(farthest_point_sample_sharded(1, xyz, mesh)), 0
    )


@pytest.mark.parametrize("B,N,M,K", [(2, 300, 64, 8), (1, 1000, 256, 32)])
def test_query_sharded_knn_matches_oracle(rng, B, N, M, K):
    """Query-sharded decomposition: no merge, outputs sharded on M."""
    from pointasnl_tpu.parallel.sharded_knn import knn_point_query_sharded

    mesh = make_mesh()
    support = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    query = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    got_d, got_i = knn_point_query_sharded(K, support, query, mesh)
    want_d, want_i = g.knn_point(K, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )
