"""In-jit augmentation tests: invariants matching the numpy provider."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.data import augment_jax as aj


def test_rotation_preserves_norms(rng):
    x = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    out = aj.rotate_point_cloud(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out)[..., 1], np.asarray(x)[..., 1], atol=1e-5)


def test_rotation_z_preserves_z(rng):
    x = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    out = aj.rotate_point_cloud_z(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(out)[..., 2], np.asarray(x)[..., 2], atol=1e-5)


def test_jitter_bounded(rng):
    x = jnp.zeros((2, 100, 3))
    out = aj.jitter_point_cloud(jax.random.PRNGKey(0), x, sigma=0.5, clip=0.05)
    assert float(jnp.abs(out).max()) <= 0.05 + 1e-6


def test_dropout_collapses_to_first(rng):
    x = jnp.asarray(rng.randn(2, 100, 3).astype(np.float32))
    out = np.asarray(aj.random_point_dropout(jax.random.PRNGKey(3), x))
    xn = np.asarray(x)
    for b in range(2):
        changed = np.any(out[b] != xn[b], axis=1)
        assert np.all(out[b][changed] == out[b, 0])


def test_shuffle_shared_permutation():
    x = jnp.asarray(np.tile(np.arange(10, dtype=np.float32)[None, :, None], (3, 1, 3)))
    out = np.asarray(aj.shuffle_points(jax.random.PRNGKey(0), x))
    assert (out[0] == out[1]).all()
    assert sorted(out[0, :, 0].tolist()) == list(range(10))


def test_full_cls_pipeline_jits(rng):
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    f = jax.jit(lambda k, x: aj.augment_cls_batch(k, x, rotation=True))
    out = f(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
