"""Blockwise / ring attention vs dense softmax attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointasnl_tpu.nn.blockwise import blockwise_attention, ring_attention
from pointasnl_tpu.parallel import make_mesh


def dense_attention(q, k, v, scaled=True):
    scale = 1.0 / np.sqrt(q.shape[-1]) if scaled else 1.0
    attn = jax.nn.softmax(jnp.einsum("bmc,bnc->bmn", q, k) * scale, axis=-1)
    return jnp.einsum("bmn,bnd->bmd", attn, v)


def make_qkv(rng, B=2, M=16, N=256, C=8, D=12):
    q = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    return q, k, v


def test_blockwise_matches_dense(rng):
    q, k, v = make_qkv(rng)
    want = np.asarray(dense_attention(q, k, v))
    for block in (32, 64, 128):
        got = np.asarray(blockwise_attention(q, k, v, block_size=block))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blockwise_single_block_path(rng):
    q, k, v = make_qkv(rng, N=64)
    got = np.asarray(blockwise_attention(q, k, v, block_size=2048))
    want = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_attention_matches_dense(rng):
    mesh = make_mesh(axis_names=("model",))
    q, k, v = make_qkv(rng, B=2, M=8, N=8 * 16, C=8, D=4)
    got = np.asarray(jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(q, k, v))
    want = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_attention_grad(rng):
    mesh = make_mesh(axis_names=("model",))
    q, k, v = make_qkv(rng, B=1, M=4, N=8 * 8, C=4, D=4)

    def f(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense_attention(q, k, v) ** 2), argnums=(0, 1, 2))(
        q, k, v
    )
    for a, b in zip(g, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_blockwise_ragged_tail_matches_dense(rng):
    """N not divisible by block_size: padded keys are masked exactly."""
    import jax
    import jax.numpy as jnp
    from pointasnl_tpu.nn.blockwise import blockwise_attention

    q = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 100, 8).astype(np.float32))  # 100 % 32 != 0
    v = jnp.asarray(rng.randn(2, 100, 12).astype(np.float32))
    got = blockwise_attention(q, k, v, block_size=32)
    attn = jax.nn.softmax(
        jnp.einsum("bmc,bnc->bmn", q, k) / jnp.sqrt(jnp.float32(8)), axis=-1
    )
    want = jnp.einsum("bmn,bnd->bmd", attn, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
