"""PointNonLocalCell blockwise option == dense path numerics."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.nn import PointNonLocalCell


def test_nl_cell_blockwise_equals_dense(rng):
    feats = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))
    qfeats = jnp.asarray(rng.randn(2, 8, 19).astype(np.float32))
    dense = PointNonLocalCell(bottleneck=32, out_channels=24)
    blocky = PointNonLocalCell(bottleneck=32, out_channels=24, kv_block_size=64)
    variables = dense.init(
        {"params": jax.random.PRNGKey(0)}, feats, qfeats, training=True, bn_momentum=0.9
    )
    out_d, _ = dense.apply(
        variables, feats, qfeats, training=True, bn_momentum=0.9, mutable=["batch_stats"]
    )
    out_b, _ = blocky.apply(
        variables, feats, qfeats, training=True, bn_momentum=0.9, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), rtol=1e-4, atol=1e-5)


def test_sem_seg_model_blockwise_equals_dense(rng):
    """Full model forward with nl_kv_block_size set equals the dense model on
    the SAME parameters (the whole-scene switch is numerics-neutral)."""
    import jax
    import jax.numpy as jnp
    from pointasnl_tpu.models import PointASNLSemSeg

    x = jnp.asarray(rng.randn(1, 512, 3).astype(np.float32))
    dense = PointASNLSemSeg(num_class=5)
    blockwise = PointASNLSemSeg(num_class=5, nl_kv_block_size=128)
    variables = dense.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, training=False, bn_momentum=0.9,
    )
    out_d, _ = dense.apply(variables, x, training=False, bn_momentum=0.9)
    out_b, _ = blockwise.apply(variables, x, training=False, bn_momentum=0.9)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_d), rtol=2e-3, atol=2e-3
    )
