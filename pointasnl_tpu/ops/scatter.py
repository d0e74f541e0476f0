"""MXU-friendly scatter-add: the gather VJPs as chunked one-hot matmuls.

XLA lowers the VJP of take_along_axis to scatter-add, which TPUs execute
(effectively) serially: measured in isolation at the seg model's shapes
(scripts/bench_scatter_vjp.py, v5e, 2026-08-17):

    layer0_self (MK=327680, N=10240, C=6):  scatter 411.6 ms | one-hot 12.8 ms
    layer1      (MK=40960,  N=10240, C=35): scatter 466.3 ms | one-hot  5.5 ms
    layer1 C=64:                            scatter 109.9 ms | one-hot  4.3 ms

The one-hot form computes dPoints = onehot(idx)^T @ dOut in MK-chunks via
lax.scan — 2*B*MK*N*C MXU FLOPs, no scatter anywhere. The reference's CUDA
equivalent was an atomicAdd kernel (tf_grouping_g.cu:60-78); this is the
TPU-native replacement (systolic array instead of atomics).

Numerics: the one-hot operand is exact in any precision; the default TPU
matmul rounds the dOut operand through bf16 (~1e-3 relative on the
gradients). `precision` defaults to "split2" (r4): one bf16 one-hot, two
default-precision passes against the cotangents' bf16 hi/lo halves —
~1e-5-relative gradients at ~2/3 the MXU cost of HIGHEST (see
onehot_scatter_add and BENCH_OPS.md).

`gather_point_mxu` / `group_point_mxu` are drop-in replacements for the
geometry gathers with this backward; ops.dispatch selects them on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from pointasnl_tpu.ops import geometry as _g

_CHUNK = 2048


def onehot_scatter_add(dout, idx, n: int, *, chunk: int = _CHUNK,
                       precision="split2"):
    """Sum dout rows into their idx bins: (B, MK, C), (B, MK) -> (B, N, C).

    Equivalent to `zeros(B, N, C).at[b, idx].add(dout)` but computed as
    one-hot matmuls on the MXU, streamed over MK chunks of `chunk` rows so
    the (chunk, N) one-hot block never exceeds a few MB.

    Layout (r4): for narrow channel counts the natural `oh^T @ dout ->
    (N, C)` form puts C on the 128-wide MXU lane axis — at the stem's C=6
    that is 4.7% lane utilization, and the padded-FLOP cost (measured
    ~17 ms of the seg step's backward) dwarfs the nominal FLOPs. Computing
    the TRANSPOSED product `dout^T @ oh -> (C, N)` instead puts N on the
    lane axis (full) and C on the 8-deep sublane axis, then transposes the
    small (B, C, N) accumulator once after the scan. Selected whenever C
    is below the 128-lane width; at C >= 128 both forms fill the lanes and
    the natural one skips the final transpose.

    Precision (r4): `precision="split2"` (the default) exploits that the
    one-hot operand is EXACT in bf16 (entries are 0/1) — only the
    cotangent side needs splitting. It builds the bf16 one-hot once and
    runs TWO default-precision passes against the cotangents' bf16
    hi/lo halves (dout = hi + lo + r2, |r2| <~ eps_bf16^2 |dout|), for
    gradients ~1e-5-relative of the exact scatter at ~2/3 the MXU cost of
    Precision.HIGHEST (which splits BOTH operands into 3 passes, wasting
    one on the exactly-representable one-hot). Pass a lax.Precision to get
    the plain single-einsum forms instead (DEFAULT: bf16 1-pass ~2e-3
    rel; HIGHEST: f32-exact, for parity oracles).
    """
    B, MK, C = dout.shape
    pad = (-MK) % chunk
    if pad:
        dout = jnp.pad(dout, ((0, 0), (0, pad), (0, 0)))
        # out-of-range index -> matches no support row -> contributes zero
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=n)
    nchunk = (MK + pad) // chunk
    dc = dout.reshape(B, nchunk, chunk, C).swapaxes(0, 1)
    ic = idx.reshape(B, nchunk, chunk).swapaxes(0, 1)
    iota = jnp.arange(n, dtype=idx.dtype)
    transposed = C < 128

    split2 = precision == "split2" and dout.dtype == jnp.float32
    if precision == "split2" and not split2:
        # non-f32 cotangents (bf16 step, f64 parity controls): nothing to
        # split — fall back to the exact-matmul path for the dtype
        precision = lax.Precision.HIGHEST

    def body(acc, args):
        dci, ici = args
        if split2:
            oh = (ici[..., None] == iota).astype(jnp.bfloat16)  # (B, chunk, N)
            # barrier on hi: XLA elides the f32->bf16->f32 convert pair as
            # allowed precision loss, which turns lo into exact zero
            # (measured: without it split2 degrades to 1-pass bf16 error)
            hi = lax.optimization_barrier(dci.astype(jnp.bfloat16))
            lo = (dci - hi.astype(dci.dtype)).astype(jnp.bfloat16)
            # hi/lo packed on the channel axis into ONE dot: two separate
            # dots give the one-hot two consumers, which stops XLA fusing
            # the compare into the operand loads and materializes the
            # (chunk, N) one-hots to HBM (measured: two-dot split2 ran at
            # HIGHEST's speed; packed runs at the 1-pass bf16 floor)
            hl = jnp.concatenate([hi, lo], axis=-1)  # (B, chunk, 2C)
            if transposed:
                res = jnp.einsum("bck,bkn->bcn", hl.swapaxes(1, 2), oh,
                                 preferred_element_type=dout.dtype)
                return acc + res[:, :C] + res[:, C:], None
            res = jnp.einsum("bkn,bkc->bnc", oh, hl,
                             preferred_element_type=dout.dtype)
            return acc + res[..., :C] + res[..., C:], None
        oh = (ici[..., None] == iota).astype(dout.dtype)  # (B, chunk, N)
        if transposed:
            upd = jnp.einsum(
                "bck,bkn->bcn", dci.swapaxes(1, 2), oh, precision=precision
            )
        else:
            upd = jnp.einsum("bkn,bkc->bnc", oh, dci, precision=precision)
        return acc + upd, None

    acc0 = jnp.zeros((B, C, n) if transposed else (B, n, C), dout.dtype)
    out, _ = lax.scan(body, acc0, (dc, ic))
    return out.swapaxes(1, 2) if transposed else out


@jax.custom_vjp
def gather_point_mxu(points, idx):
    return _g.gather_point(points, idx)


def _gp_fwd(points, idx):
    return _g.gather_point(points, idx), (idx, points.shape[1])


def _gp_bwd(res, dout):
    idx, n = res
    return onehot_scatter_add(dout, idx, n), None


gather_point_mxu.defvjp(_gp_fwd, _gp_bwd)
gather_point_mxu.__doc__ = (_g.gather_point.__doc__ or "") + (
    "\n\nTPU variant: the scatter-add gradient runs as chunked one-hot "
    "matmuls on the MXU (ops/scatter.py)."
)


@jax.custom_vjp
def group_point_mxu(points, idx):
    return _g.group_point(points, idx)


def _grp_fwd(points, idx):
    return _g.group_point(points, idx), (idx, points.shape[1])


def _grp_bwd(res, dout):
    idx, n = res
    B, M, K, C = dout.shape
    return (
        onehot_scatter_add(dout.reshape(B, M * K, C), idx.reshape(B, M * K), n),
        None,
    )


group_point_mxu.defvjp(_grp_fwd, _grp_bwd)
group_point_mxu.__doc__ = (_g.group_point.__doc__ or "") + (
    "\n\nTPU variant: the scatter-add gradient runs as chunked one-hot "
    "matmuls on the MXU (ops/scatter.py)."
)
