"""Whole-step speed-of-light accounting (r5, VERDICT r4 item 4).

Prior rounds proved per-lever floors (BENCH_OPS.md: insertion-merge kNN
rejected on measurement, kNN-graph reuse closed on recipe analysis, scatter
VJPs driven to the split-f32 one-hot form) but never summed them into an
explicit ceiling for the two flagship steps. This script does the
arithmetic:

  1. pulls XLA cost-analysis FLOPs + bytes-accessed for the jitted train
     steps (compiled on the real chip; warm cache makes this cheap);
  2. computes the hardware ideals — MXU time at the chip's bf16 peak, HBM
     time at the chip's bandwidth, VPU time for the K-selection element-ops
     (the analytically-counted inner-loop work of ops/pallas/knn.py);
  3. prints the per-segment table against the measured decomposition
     (scripts/bench_backward.py + bench_batch_scaling.py, BENCH_OPS.md r4)
     so "floor reached" claims become checkable arithmetic.

Usage: python scripts/speed_of_light.py  (runs on the ambient backend;
pass --no-compile to skip cost analysis and use the recorded r2-r4 numbers)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# v5e TensorCore facts (public: cloud.google.com/tpu/docs/v5e).
PEAK_MXU_BF16 = 197e12     # FLOP/s; XLA's default f32 path also runs bf16 passes
HBM_BW = 819e9             # bytes/s
# VPU element-op peak: (8,128) vector lanes x 4 ALUs x ~0.94 GHz.
PEAK_VPU = 1024 * 4 * 0.94e9


def knn_selection_elops(B, M, N, K, tile_m=128):
    """VPU element-ops of the resident kNN scan's K-selection inner loop.

    Per 128-query tile and per extraction (K of them): 4 full (tile_m, N)
    passes — min-reduce, argmin mask, select, invalidate (BENCH_OPS.md
    'Where the floor is'). Plus the 3-coordinate direct-difference distance
    pass (~3 ops/element, touched once).
    """
    tiles = (M + tile_m - 1) // tile_m
    select = B * tiles * K * 4 * tile_m * N
    dist = B * tiles * 3 * 3 * tile_m * N
    return select + dist


def fmt_ms(s):
    return f"{s * 1e3:7.2f}"


def cost_analysis(task: str, batch: int, n: int):
    """(flops, bytes_accessed) of the compiled f32 train step on this
    backend. Warm persistent cache makes the compile cheap on the chip."""
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLCls, PointASNLSemSegRes
    from pointasnl_tpu.train import (
        bn_momentum_schedule, create_train_state, make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    if task == "cls":
        model = PointASNLCls(num_class=40, adaptive_sample=True)
        b = {"points": points,
             "labels": jnp.asarray(rng.randint(0, 40, size=(batch,)))}
    else:
        model = PointASNLSemSegRes(num_class=21)
        b = {"points": points,
             "labels": jnp.asarray(rng.randint(0, 21, size=(batch, n))),
             "smpw": jnp.ones((batch, n), jnp.float32)}
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, batch, 2e5, 0.7))
    state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(batch, 2e5),
                           task=task, donate=True)
    compiled = step.lower(state, b, jax.random.PRNGKey(1)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0)), float(cost.get("bytes accessed", 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-compile", action="store_true",
                    help="use recorded cost-analysis numbers (BENCH_r0*.json)")
    args = ap.parse_args()

    if args.no_compile:
        # r4/r5 driver+warm-up captures (seg includes the one-hot
        # scatter-VJP matmuls adopted in r3/r4)
        costs = {"cls": (113.86e9, None), "seg": (238.13e9, None)}
    else:
        costs = {
            "cls": cost_analysis("cls", 16, 1024),
            "seg": cost_analysis("seg", 4, 10240),
        }
    for task, (flops, byts) in costs.items():
        mxu = flops / PEAK_MXU_BF16
        hbm = (byts / HBM_BW) if byts else None
        print(f"{task}: flops/step={flops/1e9:.1f}G -> MXU ideal "
              f"{fmt_ms(mxu)} ms"
              + (f"; bytes={byts/1e6:.0f}MB -> HBM ideal {fmt_ms(hbm)} ms"
                 if hbm else ""))

    # ---- seg step table (B=4, N=10240, f32; measured = BENCH_OPS.md r4) ----
    l0 = knn_selection_elops(4, 10240, 10240, 32)
    l1 = knn_selection_elops(4, 1280, 10240, 32)
    seg_rows = [
        # segment, measured ms, ideal ms, basis
        ("layer0 self-kNN fwd", 24.41, l0 / PEAK_VPU * 1e3,
         f"{l0/1e9:.1f}G VPU el-ops @ {PEAK_VPU/1e12:.2f}T/s"),
        ("FPS (all levels)", 2.24, 0.45,
         "1720 sequential picks x ~0.26us dependent reduce latency"),
        ("layer1 kNN fwd", 6.48, l1 / PEAK_VPU * 1e3,
         f"{l1/1e9:.1f}G VPU el-ops (grid under-filled at B=4)"),
        ("dense fwd (NL, convs, AS, interp)", 14.2, 1.6,
         "~1/3 of step FLOPs on MXU + ~0.9 GB activation traffic on HBM"),
        ("backward (layer0 11.1 + layer1 6.2 + rest 2.2)", 19.5, 8.9,
         "one-hot scatter VJP measured floors (13.0+5.1 standalone) "
         "already at their lane-packed MXU form + dense bwd ~2x fwd ideal"),
    ]
    print("\n## seg_res B4x10240 f32 — measured 66.8 ms/step (fori device time)")
    print(f"{'segment':<50} {'meas ms':>8} {'ideal ms':>9}  basis")
    tot_m = tot_i = 0.0
    for name, m, i, basis in seg_rows:
        tot_m += m; tot_i += i
        print(f"{name:<50} {m:8.2f} {i:9.2f}  {basis}")
    print(f"{'TOTAL':<50} {tot_m:8.2f} {tot_i:9.2f}")
    print(f"actual/sum-of-measured-floors = {66.8 / tot_m:.3f}; "
          f"actual/hardware-ideal = {66.8 / tot_i:.1f}x")

    # ---- cls step (B=16, N=1024, f32; measured 17.5 ms bench) ----
    c_l0 = knn_selection_elops(16, 1024, 1024, 32)
    c_l1 = knn_selection_elops(16, 512, 1024, 32)
    print("\n## cls B16x1024 f32 — measured 17.5 ms/step (bench.py, "
          "incl ~2ms dispatch)")
    print(f"geometry VPU ideal: layer0 {c_l0/PEAK_VPU*1e3:.2f} + "
          f"layer1 {c_l1/PEAK_VPU*1e3:.2f} ms; measured FPS+kNN+ball "
          "~6.2 ms (2.0+2.2+2.0, each dispatch-bounded at ~2ms tunnel "
          "overhead); MXU ideal above; the cls step is dispatch- and "
          "latency-bound, not throughput-bound, at B16x1024.")


if __name__ == "__main__":
    main()
