"""Blockwise and ring (sequence-parallel) non-local attention.

The (npoint x ndataset) attention map in PointNonLocalCell is the model's only
quadratic object (utils/pointasnl_util.py:199). The reference sidesteps scale
by chopping scenes into fixed crops; these utilities are the TPU-native path
to whole-scene-at-once inference (SURVEY.md §5.7-5.8):

- `blockwise_attention`: online-softmax attention that streams K/V in chunks
  of `block_size` via lax.scan — O(M * block) memory instead of O(M * N).
  Numerically identical to dense softmax attention.
- `ring_attention`: the context-parallel version — K/V sharded over a mesh
  axis, rotated around the ring with lax.ppermute inside shard_map, each
  device combining its partial online-softmax stats. Collectives ride ICI;
  no external comm backend (the NCCL-free design of SURVEY.md §2.9).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _online_softmax_step(carry, qk_scale, q, k_blk, v_blk, valid=None):
    """One online-softmax accumulation step over a K/V block.

    `valid`: optional (blk,) bool — False keys (ragged-tail padding) score
    -1e30, so they contribute exp(...)=0 without poisoning the running max.
    """
    m_prev, l_prev, o_prev = carry  # (B,M,1), (B,M,1), (B,M,D)
    scores = jnp.einsum("bmc,bnc->bmn", q, k_blk) * qk_scale  # (B,M,blk)
    if valid is not None:
        # sentinel in the scores dtype: a strong-typed f32 constant would
        # silently promote a bf16 online-softmax accumulator to f32
        scores = jnp.where(
            valid[None, None, :], scores, jnp.asarray(-1e30, scores.dtype)
        )
    m_blk = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    p = jnp.exp(scores - m_new)  # (B,M,blk)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    o_new = o_prev * correction + jnp.einsum("bmn,bnd->bmd", p, v_blk)
    return m_new, l_new, o_new


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_size: int = 2048,
    scaled: bool = True,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v computed in K/V chunks (online softmax).

    q: (B, M, C), k: (B, N, C), v: (B, N, D) -> (B, M, D). A ragged tail
    (N not a multiple of block_size) is zero-padded and masked out of the
    softmax.
    """
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    scale = (1.0 / jnp.sqrt(jnp.float32(C))) if scaled else jnp.float32(1.0)
    if N <= block_size:
        attn = jnp.einsum("bmc,bnc->bmn", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bmn,bnd->bmd", attn, v)

    pad = (-N) % block_size
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    nblk = (N + pad) // block_size
    k_blocks = k.reshape(B, nblk, block_size, C).swapaxes(0, 1)  # (nblk, B, blk, C)
    v_blocks = v.reshape(B, nblk, block_size, D).swapaxes(0, 1)

    init = (
        jnp.full((B, M, 1), -jnp.inf, q.dtype),
        jnp.zeros((B, M, 1), q.dtype),
        jnp.zeros((B, M, D), q.dtype),
    )

    if pad:
        valid = (jnp.arange(nblk * block_size) < N).reshape(nblk, block_size)

        def scan_body(carry, kv):
            k_blk, v_blk, valid_blk = kv
            return (
                _online_softmax_step(carry, scale, q, k_blk, v_blk, valid_blk),
                None,
            )

        (m, l, o), _ = lax.scan(scan_body, init, (k_blocks, v_blocks, valid))
    else:
        # no ragged tail: skip the per-block mask entirely

        def scan_body(carry, kv):
            k_blk, v_blk = kv
            return _online_softmax_step(carry, scale, q, k_blk, v_blk), None

        (m, l, o), _ = lax.scan(scan_body, init, (k_blocks, v_blocks))
    return o / l


def ring_attention_local(
    q_loc: jax.Array,
    k_loc: jax.Array,
    v_loc: jax.Array,
    *,
    axis: str,
    axis_size: int,
    scaled: bool = True,
) -> jax.Array:
    """The shard_map-INTERNAL body of ring attention.

    Call from inside an existing shard_map over `axis`: each device attends
    its local queries over its local K/V shard, then passes the shard to the
    next device on the ring (lax.ppermute); the partial online-softmax stats
    combine exactly. `q_loc` may itself be a query shard (out stays sharded
    on M) or the full query set (out replicated) — the math is per-query.
    Used directly by parallel/whole_scene.py's point-sharded layer1_1.
    """
    C = q_loc.shape[-1]
    scale = (1.0 / jnp.sqrt(jnp.float32(C))) if scaled else jnp.float32(1.0)
    B, M, _ = q_loc.shape
    D = v_loc.shape[-1]
    init = (
        jnp.full((B, M, 1), -jnp.inf, q_loc.dtype),
        jnp.zeros((B, M, 1), q_loc.dtype),
        jnp.zeros((B, M, D), q_loc.dtype),
    )
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(i, state):
        carry, k_cur, v_cur = state
        carry = _online_softmax_step(carry, scale, q_loc, k_cur, v_cur)
        k_nxt = lax.ppermute(k_cur, axis, perm)
        v_nxt = lax.ppermute(v_cur, axis, perm)
        return carry, k_nxt, v_nxt

    (m, l, o), _, _ = lax.fori_loop(0, axis_size, body, (init, k_loc, v_loc))
    return o / l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "model",
    scaled: bool = True,
) -> jax.Array:
    """Context-parallel attention: K/V sharded over `axis`, rotated by ppermute.

    q: (B, M, C) replicated over `axis`; k: (B, N, C) and v: (B, N, D) sharded
    on their N dimension. Returns (B, M, D) replicated. Each of the
    `axis_size` steps attends to the local K/V shard and passes it to the next
    device on the ring; partial online-softmax stats combine exactly.
    """
    axis_size = mesh.shape[axis]

    def local_fn(q_loc, k_loc, v_loc):
        return ring_attention_local(
            q_loc, k_loc, v_loc, axis=axis, axis_size=axis_size, scaled=scaled
        )

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,
    )(q, k, v)
