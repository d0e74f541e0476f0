"""Flash-style fused attention Pallas kernels for the non-local cell.

The PointNonLocalCell attention map (M x ndataset) is the model's only
quadratic object (utils/pointasnl_util.py:199). XLA materializes it in HBM
twice per layer (scores out of the QK matmul, probabilities into the PV
matmul). These kernels compute softmax(QK^T/sqrt(C)) V per (batch, M-tile)
grid step entirely in VMEM, streaming K/V in chunks with an online softmax —
scores and probabilities never exist at full (TM, N) width, let alone in
HBM. (The first version held the full (TM, N) score block in VMEM, which
blew the 16 MB scoped-VMEM limit in the backward at the seg model's
layer1 shape, 1280 q x 10240 kv — hence the chunked rewrite.)

Shapes: q (B, M, C), k (B, N, C), v (B, N, D) -> (B, M, D); single head, no
mask (the cell attends over all input points). K/V for one cloud stay VMEM-
resident (N*(C+D)*4 bytes — cap checked by the caller via fits_vmem()), and
the score/probability working set is (TILE_M, CHUNK_N) regardless of N.

Backward (hand-written, VERDICT r1 item 5): the forward stores per-row
logsumexp stats; the backward recomputes normalized probabilities per
(M-tile, KV-chunk) (p = exp(s - L), rows sum to 1 across chunks), forms
dS = p * (dO V^T - rowsum(dO*O)) on chip, accumulates dQ across chunks in
registers, and accumulates dK/dV chunks into output blocks that every
M-tile of a batch revisits (TPU grid steps are sequential, so the
accumulation is race-free). Zero-padded dO rows contribute exactly zero, so
M-padding needs no masking; padded KV columns are masked to -inf scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
LANE = 128
CHUNK_N = 1024  # KV chunk: bounds the score block at (TILE_M, CHUNK_N)
_NEG = -3e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Measured compile/execute envelope of the BACKWARD kernel (the binding
# pass: K, V, dK, dV all VMEM-resident), probed on TPU v5e hardware with
# scripts/probe_flash_vmem.py (2026-08-17):
#   c=d=64 : N=57344 executes, N=61440 fails compile
#   c=d=32 : N=65536 fails compile (lane padding: a (N, 32) block occupies
#            the same 128-lane tiles as (N, 128))
#   c=d=128: N=14336 executes, N=16384 fails compile — the >=128-lane class
#   fails FAR below the bytes ceiling the small-c classes reach, so no
#   single analytic bytes model explains all three; the guard below is the
#   measured safe envelope with margin, not a derivation. Re-run the probe
#   whenever the kernel's buffers change.
_PHYS_BYTES_CAP = 100 * 1024 * 1024  # v5e VMEM is 128 MiB; keep ~22% headroom
_NPAD_CAP_WIDE = 12288  # measured c=d=128 boundary (pass 14336) minus margin
# The wide (>=128-lane) class is capped in BYTES, anchored to the measured
# c=d=128 boundary: pass 2*14336*256*4 = 29.4 MiB, fail 33.5 MiB. Applying
# the npad cap unscaled to c/d=256 would admit a 50 MiB working set — past
# the measured failure point. The bytes form keeps the same c=d=128
# threshold (npad 12288) and halves the admitted npad at c=d=256.
_WIDE_BYTES_CAP = 2 * _NPAD_CAP_WIDE * (128 + 128) * 4  # 25.2 MiB


def _bwd_working_set_bytes(n: int, c: int, d: int) -> int:
    """Physical VMEM bytes of the resident K/V + dK/dV blocks (f32, minor
    dim lane-padded to 128). Tile-local buffers add ~2-4 MiB on top; the
    measured caps in fits_vmem absorb them."""
    npad = _round_up(max(n, 1), CHUNK_N)
    lanes_c = max(c, LANE)
    lanes_d = max(d, LANE)
    return 2 * npad * (lanes_c + lanes_d) * 4  # {K,dK} + {V,dV}


def fits_vmem(n: int, c: int, d: int) -> bool:
    """Whether the flash kernels (fwd + bwd) compile and run with resident
    K/V at this shape. Measured hardware envelope (see module constants):
    bytes cap for the small-c lane classes, plus a tighter bytes cap for
    c or d >= 128 where Mosaic fails far earlier."""
    ws = _bwd_working_set_bytes(n, c, d)
    if max(c, d) > 64 and ws > _WIDE_BYTES_CAP:
        return False
    return ws <= _PHYS_BYTES_CAP


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, stats_ref,
                      *, scale: float, n: int, n_chunks: int):
    # q_ref: (1, TM, C); k_ref: (1, Np, C); v_ref: (1, Np, D);
    # o_ref: (1, TM, D); stats_ref: (1, TM, LANE) logsumexp broadcast
    q = q_ref[0]
    tm, d = q.shape[0], v_ref.shape[-1]
    col0 = lax.broadcasted_iota(jnp.int32, (tm, CHUNK_N), dimension=1)

    def chunk(i, carry):
        acc, m, l = carry
        kc = k_ref[0, pl.ds(i * CHUNK_N, CHUNK_N), :]  # (CN, C)
        vc = v_ref[0, pl.ds(i * CHUNK_N, CHUNK_N), :]  # (CN, D)
        s = lax.dot_general(
            q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (TM, CN)
        s = jnp.where(col0 + i * CHUNK_N < n, s, _NEG)  # mask padded KV rows
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        p = jnp.exp(s - m2)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vc, preferred_element_type=jnp.float32)
        return acc, m2, l

    acc0 = jnp.zeros((tm, d), jnp.float32)
    m0 = jnp.full((tm, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((tm, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, n_chunks, chunk, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    stats_ref[0] = jnp.broadcast_to(m + jnp.log(l), stats_ref.shape[1:]).astype(
        stats_ref.dtype
    )


def _pad_kv(k, v):
    N = k.shape[1]
    npad = _round_up(N, CHUNK_N)
    if npad != N:
        k = jnp.pad(k, ((0, 0), (0, npad - N), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, npad - N), (0, 0)))
    return k, v, npad


def _flash_forward_with_stats(q, k, v, scale: float):
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    mpad = _round_up(M, TILE_M)
    if mpad != M:
        q = jnp.pad(q, ((0, 0), (0, mpad - M), (0, 0)))
    k, v, npad = _pad_kv(k, v)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, n=N, n_chunks=npad // CHUNK_N
    )
    out, stats = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, LANE), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, D), q.dtype),
            jax.ShapeDtypeStruct((B, mpad, LANE), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * mpad * npad * (C + D),
            bytes_accessed=B * (mpad * C + npad * (C + D) + mpad * D) * 4,
            transcendentals=B * mpad * npad,
        ),
    )(q, k, v)
    return out, stats  # out (B, mpad, D), stats (B, mpad, LANE)


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, stats_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, n: int, n_chunks: int
):
    mt = pl.program_id(1)

    q = q_ref[0]          # (TM, C)
    do = do_ref[0]        # (TM, D)
    o = o_ref[0]          # (TM, D)
    L = stats_ref[0][:, :1]  # (TM, 1)
    tm, c = q.shape
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (TM, 1)
    col0 = lax.broadcasted_iota(jnp.int32, (tm, CHUNK_N), dimension=1)

    # dk/dv blocks are revisited by every M-tile of this batch: zero at the
    # first tile, accumulate afterwards (grid steps run sequentially on TPU).
    @pl.when(mt == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    def chunk(i, dq_acc):
        sl = pl.ds(i * CHUNK_N, CHUNK_N)
        kc = k_ref[0, sl, :]  # (CN, C)
        vc = v_ref[0, sl, :]  # (CN, D)
        s = lax.dot_general(
            q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(col0 + i * CHUNK_N < n, s, _NEG)
        p = jnp.exp(s - L)  # (TM, CN); rows sum to 1 ACROSS chunks
        dov = lax.dot_general(
            do, vc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TM, CN)
        ds = p * (dov - delta) * scale
        dq_acc = dq_acc + jnp.dot(ds, kc, preferred_element_type=jnp.float32)
        dk_ref[0, sl, :] = dk_ref[0, sl, :] + lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dv_ref[0, sl, :] = dv_ref[0, sl, :] + lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        return dq_acc

    dq = lax.fori_loop(0, n_chunks, chunk, jnp.zeros((tm, c), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_backward(q, k, v, o_pad, stats, do, scale: float):
    B, M, C = q.shape
    N = k.shape[1]
    D = v.shape[-1]
    mpad = o_pad.shape[1]
    if mpad != M:
        q = jnp.pad(q, ((0, 0), (0, mpad - M), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, mpad - M), (0, 0)))  # zero rows -> zero grads
    k_p, v_p, npad = _pad_kv(k, v)

    kernel = functools.partial(
        _flash_bwd_kernel, scale=scale, n=N, n_chunks=npad // CHUNK_N
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, D), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, LANE), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, C), lambda b, mt: (b, mt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, C), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, D), lambda b, mt: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, C), q.dtype),
            jax.ShapeDtypeStruct((B, npad, C), k.dtype),
            jax.ShapeDtypeStruct((B, npad, D), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * mpad * npad * (C + D),
            bytes_accessed=B * (2 * mpad * (C + 2 * D) + 2 * npad * (C + D)) * 4,
            transcendentals=B * mpad * npad,
        ),
    )(q, k_p, v_p, do, o_pad, stats)
    return dq[:, :M, :], dk[:, :N, :], dv[:, :N, :]


def _check_fits(k, v):
    """Actionable error instead of a compile-time scoped-VMEM crash when K/V
    exceed the resident budget (callers: route to blockwise_attention)."""
    n, c = k.shape[1], k.shape[-1]
    d = v.shape[-1]
    if not fits_vmem(n, c, d):
        raise ValueError(
            f"flash_attention: K/V of N={n}, C={c}, D={d} exceed the "
            f"measured VMEM-resident envelope "
            f"({_bwd_working_set_bytes(n, c, d)} B vs cap {_PHYS_BYTES_CAP} B"
            f", npad cap {_NPAD_CAP_WIDE} for c/d > 64); use "
            "nn.blockwise.blockwise_attention (numerically identical, "
            "streams K/V from HBM) for this shape."
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scaled: bool = True):
    """Fused softmax(q k^T [/ sqrt(C)]) v. q (B,M,C), k (B,N,C), v (B,N,D)."""
    import math

    _check_fits(k, v)
    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    out, _ = _flash_forward_with_stats(q, k, v, scale)
    return out[:, : q.shape[1], :]


def _fwd(q, k, v, scaled):
    import math

    _check_fits(k, v)
    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    out, stats = _flash_forward_with_stats(q, k, v, scale)
    return out[:, : q.shape[1], :], (q, k, v, out, stats)


def _bwd(scaled, res, ct):
    import math

    q, k, v, o_pad, stats = res
    scale = 1.0 / math.sqrt(q.shape[-1]) if scaled else 1.0
    return _flash_backward(q, k, v, o_pad, stats, ct, scale)


flash_attention.defvjp(_fwd, _bwd)
