"""Point-sharded whole-scene forward vs the monolithic model (8-dev mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointasnl_tpu.models import PointASNLSemSegRes
from pointasnl_tpu.parallel import make_mesh
from pointasnl_tpu.parallel.whole_scene import predict_scene_sharded


def _init(model, x):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, training=False, bn_momentum=0.9)


@pytest.mark.parametrize("feature_channel", [0, 3], ids=["xyz", "rgb"])
def test_sharded_scene_matches_model(rng, feature_channel):
    mesh = make_mesh()
    B, N, C = 1, 2048, 5  # N divisible by 256 * 8
    x = jnp.asarray(rng.randn(B, N, 3 + feature_channel).astype(np.float32))
    model = PointASNLSemSegRes(num_class=C, feature_channel=feature_channel)
    variables = _init(model, x)

    want, _ = model.apply(variables, x, training=False, bn_momentum=0.9)
    got = predict_scene_sharded(
        variables, x, mesh, num_class=C, feature_channel=feature_channel,
        nl_kv_block_size=None,  # dense NL at the replicated levels 2-4
    )
    assert got.shape == (B, N, C)
    # layer1's non-local cell runs as RING attention over the sharded point
    # axis (r3 redesign) — the online-softmax reduction order differs from
    # the monolithic dense map, and the reordering noise amplifies through
    # the decoder's BN on random-init activations (measured: 0.16% of
    # elements beyond 2e-4, max rel diff 1.2e-3 at N=2048). Tolerance set
    # above that; single-cell ring==dense equivalence is pinned tightly in
    # tests/test_blockwise.py.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3
    )


def test_sharded_scene_blockwise_nl_close(rng):
    """Blockwise-NL streaming (the at-scale configuration) stays numerically
    equivalent to the dense maps."""
    mesh = make_mesh()
    x = jnp.asarray(rng.randn(1, 2048, 3).astype(np.float32))
    model = PointASNLSemSegRes(num_class=4)
    variables = _init(model, x)
    want, _ = model.apply(variables, x, training=False, bn_momentum=0.9)
    got = predict_scene_sharded(variables, x, mesh, num_class=4,
                                nl_kv_block_size=512)
    # online-softmax summation order differs from the dense map; through 4
    # NL layers + BN on random-init activations the reordering noise
    # amplifies to ~0.6% relative — a sanity bound, not a bitwise claim
    # (single-cell equivalence is pinned tightly in test_nl_blockwise.py)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_sharded_scene_rejects_bad_n(rng):
    mesh = make_mesh()
    x = jnp.zeros((1, 1000, 3), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        predict_scene_sharded({"params": {}}, x, mesh)


@pytest.mark.parametrize("feature_channel", [0, 1], ids=["xyz", "remission"])
def test_sharded_scan_matches_model(rng, feature_channel):
    """predict_scan_sharded (the encoder-decoder pointasnl_sem_seg) vs the
    monolithic model on the 8-device mesh."""
    from pointasnl_tpu.models import PointASNLSemSeg
    from pointasnl_tpu.parallel.whole_scene import predict_scan_sharded

    mesh = make_mesh()
    B, N, C = 1, 2048, 5  # N divisible by 256 * 8
    x = jnp.asarray(rng.randn(B, N, 3 + feature_channel).astype(np.float32))
    model = PointASNLSemSeg(num_class=C, feature_channel=feature_channel)
    variables = _init(model, x)

    want, _ = model.apply(variables, x, training=False, bn_momentum=0.9)
    got = predict_scan_sharded(
        variables, x, mesh, num_class=C, feature_channel=feature_channel,
        nl_kv_block_size=None,  # dense NL at the replicated levels 2-4
    )
    assert got.shape == (B, N, C)
    # layer1's non-local cell runs as RING attention over the sharded point
    # axis — same tolerance rationale as test_sharded_scene_matches_model.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3
    )


def test_sharded_scan_rejects_bad_n(rng):
    from pointasnl_tpu.parallel.whole_scene import predict_scan_sharded

    mesh = make_mesh()
    x = jnp.zeros((1, 1000, 3), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        predict_scan_sharded({"params": {}}, x, mesh)
