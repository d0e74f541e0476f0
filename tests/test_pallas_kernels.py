"""Pallas kernel tests (interpret mode on CPU) against the jnp oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointasnl_tpu.ops import geometry as g
from pointasnl_tpu.ops import geometry as g_mod  # alias: some params shadow `g`
from pointasnl_tpu.ops.dispatch import ops_backend
from pointasnl_tpu.ops.pallas import fps as pfps


@pytest.mark.parametrize("B,N,M", [(2, 256, 64), (1, 300, 50), (3, 128, 128)])
def test_pallas_fps_matches_oracle(rng, B, N, M):
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pfps.farthest_point_sample(M, xyz))
    want = np.asarray(g.farthest_point_sample(M, xyz))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_npoint_one(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pfps.farthest_point_sample(1, xyz))
    np.testing.assert_array_equal(got, 0)


def test_dispatch_backend_override(rng):
    """ops_backend('jnp') forces the oracle; 'auto' on CPU also uses jnp."""
    from pointasnl_tpu import ops

    xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    with ops_backend("jnp"):
        idx = ops.farthest_point_sample(8, xyz)
    assert idx.shape == (1, 8)


@pytest.mark.parametrize("B,N,M,K", [(2, 256, 64, 8), (1, 300, 50, 16), (2, 128, 128, 32)])
def test_pallas_knn_matches_oracle(rng, B, N, M, K):
    from pointasnl_tpu.ops.pallas import knn as pknn

    support = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    query = support[:, :M]  # query subset of support, like the SA layers
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn.knn_point(K, support, query)
    want_d, want_i = g.knn_point(K, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )


def test_pallas_knn_disjoint_query(rng):
    from pointasnl_tpu.ops.pallas import knn as pknn

    support = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32))
    query = jnp.asarray(rng.randn(1, 70, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn.knn_point(12, support, query)
    want_d, want_i = g.knn_point(12, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("B,N,M,K,r", [(2, 256, 64, 32, 0.4), (1, 300, 50, 16, 0.25)])
def test_pallas_ball_query_matches_oracle(rng, B, N, M, K, r):
    from pointasnl_tpu.ops.pallas import ball_query as pball

    xyz = jnp.asarray((rng.rand(B, N, 3) * 2 - 1).astype(np.float32))
    new_xyz = xyz[:, :M]
    with pltpu.force_tpu_interpret_mode():
        got_i, got_c = pball.query_ball_point(r, K, xyz, new_xyz)
    want_i, want_c = g.query_ball_point(r, K, xyz, new_xyz)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


def test_pallas_ball_query_empty_ball(rng):
    from pointasnl_tpu.ops.pallas import ball_query as pball

    xyz = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 10)
    far = jnp.asarray(np.full((1, 8, 3), 100.0, np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_i, got_c = pball.query_ball_point(0.1, 8, xyz, far)
    np.testing.assert_array_equal(np.asarray(got_i), 0)
    np.testing.assert_array_equal(np.asarray(got_c), 0)


def test_pallas_knn_multi_chunk_streaming(rng, monkeypatch):
    """N spanning several support chunks merges identically to the oracle."""
    from pointasnl_tpu.ops.pallas import knn as pknn

    monkeypatch.setenv("POINTASNL_KNN_SPATIAL", "never")
    old = (pknn.TILE_N, pknn.RESIDENT_MAX_N)
    pknn.TILE_N = 128  # force multi-chunk at test sizes
    pknn.RESIDENT_MAX_N = 0  # force the streaming kernel
    try:
        support = jnp.asarray(rng.randn(2, 700, 3).astype(np.float32))
        query = support[:, :150]
        with pltpu.force_tpu_interpret_mode():
            got_d, got_i = pknn.knn_point(16, support, query)
        want_d, want_i = g.knn_point(16, support, query)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
        )
    finally:
        pknn.TILE_N, pknn.RESIDENT_MAX_N = old


@pytest.mark.parametrize(
    "B,N,M,K,self_q",
    [(2, 600, 600, 8, True), (2, 600, 170, 16, False),
     (1, 1024, 1024, 32, True), (1, 300, 50, 3, False)],
)
def test_pallas_knn_spatial_matches_oracle(rng, B, N, M, K, self_q):
    """The Morton/bound-pruned kernel is exact, including disjoint queries."""
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    support = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    query = support if self_q else jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = ks.knn_point(K, support, query)
    want_d, want_i = g.knn_point(K, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "B,N,M,K,self_q,g,gt",
    [(1, 1500, 1500, 8, True, 4, 2), (2, 900, 300, 16, False, 2, 4),
     (1, 1100, 1100, 32, True, 8, 1)],
)
def test_pallas_knn_spatial_two_level_matches_oracle(rng, B, N, M, K,
                                                     self_q, g, gt):
    """The two-level (supersegment/supertile) visit ordering — the mode that
    extends the kernel past SORT_MAX_SEGS segments — stays exact: group
    bounds only weaken the ordering, never the per-segment gating."""
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    support = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    query = support if self_q else jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = ks.knn_point(
            K, support, query, seg_w=128, force_g=g, force_gt=gt
        )
    want_d, want_i = g_mod.knn_point(K, support, query)
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)
    want_d, want_i = np.asarray(want_d), np.asarray(want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)
    # Index disagreements are allowed ONLY at f32 near-ties (the kernel and
    # the oracle round the same f64 distance differently at the last ulp —
    # verified identical in single-level mode on the same clouds, so any
    # EXTRA mismatch would flag a real two-level pruning bug).
    mism = got_i != want_i
    assert mism.mean() < 1e-3, f"{mism.sum()} index mismatches"
    np.testing.assert_allclose(
        got_d[mism], want_d[mism], rtol=1e-6, atol=1e-6
    )


def test_pallas_knn_spatial_duplicate_ties(rng):
    """Pruning must keep exact lower-index tie-breaks on coincident points
    (the ScanNet crops pad scenes by duplication, so exact ties are the
    common case, not a corner)."""
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    pts = rng.randn(1, 100, 3).astype(np.float32)
    dup = jnp.asarray(np.concatenate([pts, pts[:, :60], pts[:, :40]], axis=1))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = ks.knn_point(8, dup, dup)
    want_d, want_i = g.knn_point(8, dup, dup)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )


def test_knn_routing_spatial_env(rng, monkeypatch):
    """POINTASNL_KNN_SPATIAL=always routes small N through the spatial path."""
    from pointasnl_tpu.ops.pallas import knn as pknn

    monkeypatch.setenv("POINTASNL_KNN_SPATIAL", "always")
    support = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn.knn_point(8, support, support)
    want_d, want_i = g.knn_point(8, support, support)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_pallas_knn_spatial_far_from_origin_exact(rng):
    """The spatial kernel computes DIRECT squared differences, so it stays
    exact for dense clusters far from the origin — where the
    |q|^2+|s|^2-2qs expansion loses eps*|coord|^2 (~0.4 absolute at offset
    1000, versus true neighbor gaps of ~1e-4). This is the regime of
    whole-scene / outdoor-scan inference; the reference's nanoflann had the
    same direct-difference numerics (knn_.cxx L2 adapter)."""
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    pts = (rng.randn(1, 400, 3) * 0.01 + 1000.0).astype(np.float32)
    support = jnp.asarray(pts)
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = ks.knn_point(8, support, support)
    # float64 ground truth (the f32 jnp oracle is NOT exact here)
    x = pts[0].astype(np.float64)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(np.asarray(got_i)[0], want)


def test_knn_spatial_two_level_engages_automatically(rng, monkeypatch):
    """Past SORT_MAX_SEGS segments the two-level ordering must engage on its
    own (not only under the force_g test override) and stay exact — this is
    the path real whole-scene calls beyond 524288 points take."""
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    monkeypatch.setattr(ks, "SORT_MAX_SEGS", 4)  # 1664/128 = 13 segs -> g=4
    support = jnp.asarray(rng.randn(1, 1664, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = ks.knn_point(8, support, support, seg_w=128)
    want_d, want_i = g.knn_point(8, support, support)
    got_i, want_i = np.asarray(got_i), np.asarray(want_i)
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-5
    )
    mism = got_i != want_i
    assert mism.mean() < 1e-3, f"{mism.sum()} index mismatches"
    np.testing.assert_allclose(
        np.asarray(got_d)[mism], np.asarray(want_d)[mism], rtol=1e-6, atol=1e-6
    )


def test_knn_routing_beyond_spatial_cap_falls_to_streaming(rng, monkeypatch):
    """N above MAX_SPATIAL_HBM_N (and k above KP) must fall back to the
    streaming scan — the routing ladder's last rung — with oracle results."""
    from pointasnl_tpu.ops.pallas import knn as pknn
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    monkeypatch.setattr(pknn, "RESIDENT_MAX_N", 0)
    monkeypatch.setattr(pknn, "RESIDENT_RAISED_MAX_N", 0, raising=False)
    monkeypatch.setattr(pknn, "TILE_N", 128)
    monkeypatch.setattr(ks, "MAX_SPATIAL_HBM_N", 0)  # N "too big" for spatial
    support = jnp.asarray(rng.randn(1, 700, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn.knn_point(8, support, support)
    want_d, want_i = g.knn_point(8, support, support)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_knn_routing_reaches_hbm_spatial_mode(rng, monkeypatch):
    """The public knn_point gate must accept up to MAX_SPATIAL_HBM_N, not
    just the VMEM cap (regression: the HBM-pack mode was unreachable)."""
    from pointasnl_tpu.ops.pallas import knn as pknn
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    monkeypatch.setattr(pknn, "RESIDENT_MAX_N", 0)
    monkeypatch.setattr(ks, "MAX_SPATIAL_N", 0)  # force the HBM-pack mode
    support = jnp.asarray(rng.randn(1, 640, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn.knn_point(8, support, support)
    want_d, want_i = g.knn_point(8, support, support)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_knn_resident_raised_rung_matches_oracle(rng, monkeypatch):
    """The raised-VMEM resident rung (RESIDENT_MAX_N < N <=
    RESIDENT_RAISED_MAX_N in _knn_scan, compiled with an explicit
    vmem_limit_bytes) must stay oracle-exact. Forced small via the
    threshold constants so the rung itself runs, not just its gate."""
    from pointasnl_tpu.ops.pallas import knn as pknn

    monkeypatch.setattr(pknn, "RESIDENT_MAX_N", 128)
    monkeypatch.setattr(pknn, "VMEM_RAISE_THRESHOLD_BYTES", 0)
    support = jnp.asarray(rng.randn(2, 700, 3).astype(np.float32))
    query = jnp.asarray(rng.randn(2, 300, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = pknn._knn_scan(8, support, query)
    want_d, want_i = g.knn_point(8, support, query)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-6
    )
