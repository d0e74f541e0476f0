"""Spatially-pruned exact kNN Pallas TPU kernel.

The resident/streaming kernels in ops/pallas/knn.py scan EVERY support point
per query tile; their sort-free K-selection is VPU-bound at ~O(K·N) work per
query, and the layer0 self-kNN (10240x10240, k=32) alone costs ~25 ms of the
80 ms seg train step (BENCH_OPS.md). This kernel prunes that work with exact
geometry instead of approximating it:

  1. Support points are Morton-sorted (host-free, jnp bit ops + one XLA
     argsort) and packed into VMEM-resident segments of SEG_W points with
     bounding-sphere stats (center, radius).
  2. Query points are sorted on the same grid and tiled by TILE_M, giving
     each tile its own bounding sphere.
  3. Per (tile, segment), a lower bound on any query-support distance is
     lb = max(0, |qc - sc| - qr - sr).  Segments are visited nearest-first
     (a tiny (T, S) argsort), and the kernel's while-loop STOPS as soon as
     the next segment's lb exceeds the tile's current worst kth distance —
     every remaining segment provably cannot contribute a neighbor.
     Past SORT_MAX_SEGS segments the ordering goes TWO-LEVEL: supersegments
     of g segments (the smallest power of two keeping S/g <= SORT_MAX_SEGS)
     are ordered per supertile of SUP_GT query tiles, and
     a visited supersegment walks its members in position order — group
     spheres contain member spheres, so group bounds are still valid lower
     bounds and pruning stays exact; this keeps the sorted matrix at
     (T/SUP_GT, S/SUP_G) and extends the single-chip cap to N=2097152.
  4. Visited segments compute a (TILE_M, SEG_W) distance block (direct VPU
     squared differences — see the in-kernel note on why not the MXU
     expansion) and fold it into the running top-k ONLY if the block
     minimum beats the tile bound (most late segments don't).

Pruning is exact, not approximate: a segment is skipped only when its
lower bound proves no candidate can displace any current top-k entry,
including ties. Float32 slack is handled ABSOLUTELY, not relatively: the
bound lb = |qc - sc| - qr - sr suffers cancellation error proportional to
the coordinate magnitude (a few ulps of |qc - sc|, regardless of how small
lb itself is), so segment radii are inflated by ~1e-5 of the scene extent
at preprocessing — orders of magnitude above the true error, negligible
against real segment radii.

Tie-break parity with the oracle (lax.top_k stability = lowest support index
wins) is kept explicitly: the merge extracts by lexicographic (d2, original
index) minima — original ids ride through the kernel as exact float32
integers, so results need no index remapping, only a row unsort.

Reference contract: utils/nearest_neighbors/knn_.cxx:104-135 (nanoflann
KD-tree under tf.py_func) — this kernel is its TPU-native answer: the same
"prune by spatial bounds" idea, restructured from a pointer-chasing tree to
sorted segment spheres so the scan stays on the MXU/VPU with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128  # queries per tile
SEG_W = 512  # support points per segment (swept at N=131072, BENCH_OPS.md)
KP = 128  # running top-k lanes (k <= KP)
# VMEM cap for the resident packed support (S * 8 * SEG_W * 4 bytes); above
# it the pack stays in HBM and visited segments are DMA'd on demand — the
# pruning makes the DMA traffic sparse, the TPU analog of a KD-tree's
# "touch only nearby leaves".
MAX_SPATIAL_N = 1 << 18
# Cap for the HBM-pack mode. The (T, S) per-tile visit-order argsort grows
# as N^2/(TILE_M*SEG_W); past SORT_MAX_SEGS segments the kernel switches to
# a TWO-LEVEL ordering (supersegments of SUP_G segments, visit orders shared
# across SUP_GT adjacent query tiles) that keeps the sorted matrix at
# (T/SUP_GT, S/SUP_G) — both groupings only WEAKEN the lower bounds used
# for ordering/early-stop (a containing sphere's bound is still a valid
# lower bound), so pruning stays exact; the per-segment, per-row bounds
# inside the kernel are unchanged and do the tight gating.
MAX_SPATIAL_HBM_N = 1 << 21
SORT_MAX_SEGS = 1024
SUP_GT = 4  # query tiles sharing one visit order in two-level mode
_INF = 3e38
_BIGID = 3e38
# Absolute slack on sphere bounds, as a fraction of the scene extent: the
# f32 error of |qc-sc| - qr - sr is absolute (~ulps of the coordinate
# magnitude, NOT of the small difference), so a relative shrink of lb^2
# cannot cover it. Inflating the segment radii by EPS_FRAC * extent gives
# every bound (tile-level and per-row) a margin ~100x the true error.
_EPS_FRAC = 1e-5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spread3(v):
    """Spread 10 bits of v to every 3rd bit (Morton interleave helper)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _morton_codes(xyz, lo, hi):
    """30-bit Morton codes of xyz quantized to a 1024^3 grid over [lo, hi]."""
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((xyz - lo) * scale), 0.0, 1023.0).astype(jnp.int32)
    return (
        _spread3(q[..., 0]) | (_spread3(q[..., 1]) << 1) | (_spread3(q[..., 2]) << 2)
    ).astype(jnp.int32)


def _sphere(points):
    """Bounding sphere (center, radius) over axis -2 of (..., W, 3) points."""
    lo = jnp.min(points, axis=-2)
    hi = jnp.max(points, axis=-2)
    c = 0.5 * (lo + hi)
    r2 = jnp.max(jnp.sum(jnp.square(points - c[..., None, :]), axis=-1), axis=-1)
    return c, jnp.sqrt(r2)


def _knn_spatial_kernel(q_ref, pack_ref, order_ref, lbs_ref, sph_ref,
                        dist_ref, idx_ref, blk_scratch, dma_sem,
                        *, k: int, n_sup: int, g: int, tile_m: int,
                        resident: bool):
    # q_ref:    (1, TILE_M, 8) sorted query xyz in lanes 0-2, rest zero
    #           (8 logical lanes keep HBM/DMA small; Mosaic lane-pads the
    #           VMEM tiles internally either way)
    # pack_ref: (1, S, 8, SEG_W) VMEM when resident, else the full
    #           (B, S, 8, SEG_W) array left in HBM (ANY) and DMA'd per visit
    # order_ref:(1, 1, n_sup + 1) int32 SMEM — SUPERsegment visit order,
    #           nearest first (a supersegment = g consecutive segments;
    #           g == 1 is the single-level mode)
    # lbs_ref:  (1, 1, n_sup + 1) f32 SMEM — matching lower bounds; +inf
    #           sentinel
    # sph_ref:  (1, S, 8) f32 VMEM — segment bounding spheres in lanes
    #           0-3 (cx, cy, cz, r), rest zero. VMEM (not SMEM) because the
    #           table is S-sized: past ~1024 segments a (S, 4) SMEM table
    #           exceeds the per-core scalar-memory budget (measured: the
    #           remote compile crashes at 32 KB where 16 KB passes), while
    #           the lane-vector rows cost the same one-VPU-block per gate
    #           evaluation as the scalar form.
    # dist/idx: (1, TILE_M, KP)
    # blk_scratch/dma_sem: (8, SEG_W) VMEM landing pad + semaphore (HBM mode)
    q = q_ref[0]  # (tile_m, 4)
    out_lanes = lax.broadcasted_iota(jnp.int32, (tile_m, KP), dimension=1)

    def merge(run_d, run_i, d2, ids):
        cd = jnp.concatenate([run_d, d2], axis=1)  # (TILE_M, KP + SEG_W)
        ci = jnp.concatenate([run_i, jnp.broadcast_to(ids, d2.shape)], axis=1)

        def body(j, carry):
            cd, nd, ni = carry
            md = jnp.min(cd, axis=1, keepdims=True)
            # lowest original id among distance ties — the oracle's stability
            mi = jnp.min(jnp.where(cd == md, ci, _BIGID), axis=1, keepdims=True)
            nd = jnp.where(out_lanes == j, md, nd)
            ni = jnp.where(out_lanes == j, mi, ni)
            cd = jnp.where((cd == md) & (ci == mi), _INF, cd)
            return cd, nd, ni

        nd0 = jnp.full((tile_m, KP), _INF, jnp.float32)
        ni0 = jnp.zeros((tile_m, KP), jnp.float32)
        _, nd, ni = lax.fori_loop(0, k, body, (cd, nd0, ni0))
        return nd, ni

    def cond(carry):
        s, lb, bound, _, _ = carry
        return (s < n_sup) & (lb <= bound)

    def seg_step(seg, bound, run_d, run_i):
        # Per-ROW sphere bound: row r can gain a neighbor from this segment
        # only if max(0, |q_r - c| - r_seg)^2 <= r's own kth distance. This
        # is far tighter than the tile-level bound that ordered the visit
        # (one VPU block row vs a (tile_m, SEG_W) block visit). The sphere
        # row lives in VMEM lanes: centre distance is a masked lane reduce
        # of (q - sphrow)^2 (q's lanes past 2 and sphrow's past 3 are zero).
        sphrow = sph_ref[0, seg][None, :]  # (1, 8)
        lane128 = lax.broadcasted_iota(jnp.int32, sphrow.shape, 1)
        dq2 = jnp.sum(
            jnp.where(lane128 < 3, jnp.square(q - sphrow), 0.0),
            axis=1,
            keepdims=True,
        )
        rad = jnp.sum(jnp.where(lane128 == 3, sphrow, 0.0))
        lb_row = jnp.square(jnp.maximum(jnp.sqrt(dq2) - rad, 0.0))
        rowkth = run_d[:, k - 1 : k]

        def visit(args):
            run_d, run_i = args
            if resident:
                blk = pack_ref[0, seg]  # (8, SEG_W)
            else:
                copy = pltpu.make_async_copy(
                    pack_ref.at[pl.program_id(0), seg], blk_scratch, dma_sem
                )
                copy.start()
                copy.wait()
                blk = blk_scratch[...]
            # DIRECT differences, not the |q|^2+|s|^2-2qs expansion: the
            # expansion's error grows as eps*(|q|^2+|s|^2) — ~2e-5 absolute
            # on a 9 m scene, comparable to real neighbor gaps at scan
            # density — while direct differences stay at eps*d2 (~1e-7
            # relative), matching the reference's nanoflann numerics
            # (knn_.cxx L2 adapter). This kernel serves scene-scale N,
            # where the distinction decides ~1% of neighbor ranks; the
            # 8-op VPU cost is negligible next to the merge.
            d2 = (
                jnp.square(q[:, 0:1] - blk[0:1, :])
                + jnp.square(q[:, 1:2] - blk[1:2, :])
                + jnp.square(q[:, 2:3] - blk[2:3, :])
            )
            # padded support lanes carry s2=+inf in row 4: mask them out
            d2 = jnp.where(blk[4:5, :] < _INF, d2, _INF)
            blkmin = jnp.min(d2)

            def do_merge(args):
                run_d, run_i = args
                nd, ni = merge(run_d, run_i, d2, blk[5:6, :])
                return nd, ni, jnp.max(nd[:, k - 1 : k])

            return lax.cond(
                blkmin <= bound, do_merge, lambda a: (a[0], a[1], bound),
                (run_d, run_i),
            )

        run_d, run_i, bound = lax.cond(
            jnp.any(lb_row <= rowkth), visit, lambda a: (a[0], a[1], bound),
            (run_d, run_i),
        )
        return bound, run_d, run_i

    def step(carry):
        s, _, bound, run_d, run_i = carry
        sup = order_ref[0, 0, s]
        if g == 1:
            bound, run_d, run_i = seg_step(sup, bound, run_d, run_i)
        else:
            # Two-level mode: visit the supersegment's g member segments in
            # position order — the per-segment per-row bounds (above) do the
            # tight gating; only the visit ORDER and the early-stop bound
            # are at supersegment resolution.
            def inner(gi, c):
                bound, run_d, run_i = c
                return seg_step(sup * g + gi, bound, run_d, run_i)

            bound, run_d, run_i = lax.fori_loop(
                0, g, inner, (bound, run_d, run_i)
            )
        return s + 1, lbs_ref[0, 0, s + 1], bound, run_d, run_i

    init = (
        jnp.int32(0),
        lbs_ref[0, 0, 0],
        jnp.float32(_INF),
        jnp.full((tile_m, KP), _INF, jnp.float32),
        jnp.zeros((tile_m, KP), jnp.float32),
    )
    _, _, _, run_d, run_i = lax.while_loop(cond, step, init)
    dist_ref[0] = jnp.maximum(run_d, 0.0)
    idx_ref[0] = run_i.astype(jnp.int32)


def knn_point(k: int, support: jax.Array, query: jax.Array,
              *, seg_w: int = None, tile_m: int = None,
              force_g: int = None, force_gt: int = None):
    """Spatially-pruned exact kNN: support (B,N,3), query (B,M,3) -> (B,M,k).

    Same contract as ops.geometry.knn_point (ascending squared distances,
    lowest-index tie-breaks, query-in-support self-match). Gradients are cut,
    like every kNN path (the reference's ran under tf.py_func).
    seg_w / tile_m override the segment width and query tile (sweeps);
    force_g / force_gt pin the two-level grouping factors (tests).
    """
    N = support.shape[1]
    if k > N or k > KP or N > MAX_SPATIAL_HBM_N:
        from pointasnl_tpu.ops.pallas import knn as _pknn

        return _pknn.knn_point(k, support, query)
    seg_w = seg_w or SEG_W
    tile_m = tile_m or TILE_M
    # The identity check must happen OUTSIDE the jit boundary: inside,
    # support and query are distinct tracers even when the caller passed the
    # same array (the self-kNN layers do — grouping passes xyz twice).
    if query is support:
        return _knn_spatial(k, seg_w, tile_m, support, None, force_g, force_gt)
    return _knn_spatial(k, seg_w, tile_m, support, query, force_g, force_gt)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5, 6))
def _knn_spatial(k: int, SEG_W: int, TILE_M: int, support: jax.Array, query,
                 force_g: int = None, force_gt: int = None):
    B, N, _ = support.shape
    support = lax.stop_gradient(support.astype(jnp.float32))
    self_query = query is None
    if self_query:
        query = support
    else:
        query = lax.stop_gradient(query.astype(jnp.float32))
    M = query.shape[1]

    # Two-level grouping factors (shapes are static at trace time): keep the
    # per-(query-group, support-group) visit-order matrix bounded by growing
    # supersegments of g segments; once grouping is active, also share each
    # visit order across SUP_GT adjacent query tiles.
    g = force_g or 1
    if force_g is None:
        n0 = -(-N // SEG_W)  # ceil: segments before supersegment padding
        while -(-n0 // g) > SORT_MAX_SEGS:
            g *= 2
    gt = force_gt or (SUP_GT if g > 1 else 1)

    npad = _round_up(N, SEG_W * g)
    mpad = _round_up(M, TILE_M * gt)
    n_seg = npad // SEG_W
    n_sup = n_seg // g
    n_tile = mpad // TILE_M
    n_otile = n_tile // gt

    lo = jnp.min(support, axis=1, keepdims=True)
    hi = jnp.max(support, axis=1, keepdims=True)
    perm = jnp.argsort(_morton_codes(support, lo, hi), axis=1)
    s_sorted = jnp.take_along_axis(support, perm[..., None], axis=1)
    s_sorted = jnp.pad(s_sorted, ((0, 0), (0, npad - N), (0, 0)), mode="edge")
    ids = jnp.pad(perm.astype(jnp.float32), ((0, 0), (0, npad - N)), mode="edge")
    lane = jnp.arange(npad, dtype=jnp.int32)
    s2 = jnp.sum(jnp.square(s_sorted), axis=-1)
    s2 = jnp.where(lane[None, :] < N, s2, _INF)

    zeros = jnp.zeros((B, npad), jnp.float32)
    pack = jnp.stack(
        [s_sorted[..., 0], s_sorted[..., 1], s_sorted[..., 2], zeros,
         s2, ids, zeros, zeros],
        axis=-2,
    )  # (B, 8, npad)
    pack = pack.reshape(B, 8, n_seg, SEG_W).swapaxes(1, 2)  # (B, S, 8, W)

    sc, sr = _sphere(s_sorted.reshape(B, n_seg, SEG_W, 3))  # (B,S,3), (B,S)
    # absolute float32 slack for every sphere bound (see _EPS_FRAC)
    sr = sr + _EPS_FRAC * jnp.max(hi - lo, axis=-1)

    if self_query:
        q_sorted, qperm = s_sorted[:, :N], perm
    else:
        qperm = jnp.argsort(_morton_codes(query, lo, hi), axis=1)
        q_sorted = jnp.take_along_axis(query, qperm[..., None], axis=1)
    q_sorted = jnp.pad(q_sorted, ((0, 0), (0, mpad - M), (0, 0)), mode="edge")

    # Ordering spheres at GROUP resolution (supertiles x supersegments);
    # g == gt == 1 reduces to per-tile/per-segment — the single-level mode.
    # A containing sphere's lb is <= any member sphere's lb, so ordering and
    # early-stop by group bounds never skips a contributing segment.
    oqc, oqr = _sphere(q_sorted.reshape(B, n_otile, TILE_M * gt, 3))
    if g == 1:
        osc, osr = sc, sr
    else:
        osc, osr = _sphere(s_sorted.reshape(B, n_sup, SEG_W * g, 3))
        osr = osr + _EPS_FRAC * jnp.max(hi - lo, axis=-1)

    ccd = jnp.sqrt(
        jnp.maximum(
            jnp.sum(jnp.square(oqc[:, :, None] - osc[:, None]), axis=-1), 0.0
        )
    )  # (B, T/gt, S/g)
    lb = jnp.maximum(ccd - oqr[:, :, None] - osr[:, None, :], 0.0)
    lb2 = jnp.square(lb)
    order = jnp.argsort(lb2, axis=2).astype(jnp.int32)  # (B, T/gt, S/g)
    lbs = jnp.take_along_axis(lb2, order, axis=2)
    # +inf sentinel so the while loop's lookahead read at s == n_sup is safe.
    lbs = jnp.pad(lbs, ((0, 0), (0, 0), (0, 1)), constant_values=_INF)
    order = jnp.pad(order, ((0, 0), (0, 0), (0, 1)))
    # SMEM blocks: one (1, n_sup+1) row per (batch, supertile) — the
    # singleton middle dim satisfies the "block dims equal array dims" rule.
    lbs = lbs.reshape(B * n_otile, 1, n_sup + 1)
    order = order.reshape(B * n_otile, 1, n_sup + 1)

    q4 = jnp.pad(q_sorted, ((0, 0), (0, 0), (0, 5)))  # (B, mpad, 8)
    sph = jnp.concatenate([sc, sr[..., None]], axis=-1)  # (B, S, 4)
    sph = jnp.pad(sph, ((0, 0), (0, 0), (0, 4)))  # (B, S, 8) — see kernel

    resident = N <= MAX_SPATIAL_N
    pack_spec = (
        pl.BlockSpec((1, n_seg, 8, SEG_W), lambda b, t: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if resident
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    dist, idx = pl.pallas_call(
        functools.partial(_knn_spatial_kernel, k=k, n_sup=n_sup, g=g,
                          tile_m=TILE_M, resident=resident),
        grid=(B, n_tile),
        in_specs=[
            pl.BlockSpec((1, TILE_M, 8), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pack_spec,
            pl.BlockSpec((1, 1, n_sup + 1),
                         lambda b, t, no=n_otile, gg=gt: (b * no + t // gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_sup + 1),
                         lambda b, t, no=n_otile, gg=gt: (b * no + t // gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_seg, 8), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_M, KP), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, KP), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, mpad, KP), jnp.float32),
            jax.ShapeDtypeStruct((B, mpad, KP), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, SEG_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            # Assume ~1/4 of segments visited; the estimate only guides
            # XLA's scheduler, correctness never depends on it.
            flops=B * mpad * npad * 2 + B * mpad * (npad // 4) * 4 * k,
            bytes_accessed=B * (mpad * 4 + 8 * npad + 2 * mpad * KP) * 4,
            transcendentals=0,
        ),
    )(q4, pack, order, lbs, sph)

    # Rows are in Morton order; un-sort back to the caller's query order.
    binds = jnp.arange(B, dtype=jnp.int32)[:, None]
    inv = jnp.zeros((B, M), jnp.int32).at[binds, qperm].set(
        jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    )
    dist = jnp.take_along_axis(dist[:, :M, :k], inv[..., None], axis=1)
    idx = jnp.take_along_axis(idx[:, :M, :k], inv[..., None], axis=1)
    return dist, idx
