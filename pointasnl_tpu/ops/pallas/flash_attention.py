"""Flash-style fused attention Pallas kernel for the non-local cell.

The PointNonLocalCell attention map (M x ndataset) is the model's only
quadratic object (utils/pointasnl_util.py:199). XLA materializes it in HBM
twice per layer (scores out of the QK matmul, probabilities into the PV
matmul). This kernel computes softmax(QK^T/sqrt(C)) V per (batch, M-tile)
grid step entirely in VMEM: scores and probabilities never touch HBM.

Shapes: q (B, M, C), k (B, N, C), v (B, N, D) -> (B, M, D); single head, no
mask (the cell attends over all input points). K/V for one cloud fit VMEM at
every workload size (N <= ~10k, C <= 64 -> ~2.6 MB), so the kernel holds them
resident and tiles only M.

Backward: custom_vjp whose backward differentiates the numerically identical
online-softmax blockwise implementation (nn/blockwise.py) — memory-efficient
without a hand-written transpose kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref: (1, TM, C); k_ref: (1, N, C); v_ref: (1, N, D); o_ref: (1, TM, D)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TM, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    mpad = _round_up(M, TILE_M)
    if mpad != M:
        q = jnp.pad(q, ((0, 0), (0, mpad - M), (0, 0)))

    kernel = functools.partial(_flash_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, mpad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * mpad * N * (C + D),
            bytes_accessed=B * (mpad * C + N * (C + D) + mpad * D) * 4,
            transcendentals=B * mpad * N,
        ),
    )(q, k, v)
    return out[:, :M, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scaled: bool = True):
    """Fused softmax(q k^T [/ sqrt(C)]) v. q (B,M,C), k (B,N,C), v (B,N,D)."""
    import math

    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scaled):
    return flash_attention(q, k, v, scaled), (q, k, v)


def _bwd(scaled, res, ct):
    from pointasnl_tpu.nn.blockwise import blockwise_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: blockwise_attention(a, b, c, scaled=scaled), q, k, v)
    return vjp(ct)


flash_attention.defvjp(_fwd, _bwd)
