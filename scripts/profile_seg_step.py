"""Component-level breakdown of the seg flagship train step.

Answers two questions that decide the next optimization (CLAUDE.md roadmap):
  1. Does XLA CSE duplicate Pallas custom calls? The model computes the SAME
     FPS (and the same kNN) twice per residual level (layer{1..4}_1 vs _2
     branches consume identical inputs) — if custom calls are not CSE'd,
     model-level geometry reuse is a free ~2x on the structural ops.
  2. What share of the step is each geometry op at its in-model shape?

All timings fetch-forced + dependency-chained (see BENCH_OPS.md: every other
barrier lies through the tunneled runtime).

Usage: python scripts/profile_seg_step.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_time(fn, x, iters=10):
    out = fn(x)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(x.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu import ops

    rng = np.random.RandomState(0)
    B, N = 4, 10240
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))

    # --- 1. CSE probe: one vs two identical Pallas FPS calls in one program.
    def fps_once(x):
        return x + ops.farthest_point_sample(1280, x).sum() * 1e-12

    def fps_twice(x):
        a = ops.farthest_point_sample(1280, x)
        b = ops.farthest_point_sample(1280, x)
        return x + (a.sum() + b.sum()) * 1e-12

    t1 = chain_time(jax.jit(fps_once), xyz)
    t2 = chain_time(jax.jit(fps_twice), xyz)
    print(f"fps x1: {t1:.2f} ms   fps x2 (same input): {t2:.2f} ms   "
          f"-> {'CSE' if t2 < 1.5 * t1 else 'NOT CSEd'}")

    def knn_once(x):
        return x + ops.knn_point(32, x, x[:, :1280])[0].sum() * 1e-12

    def knn_twice(x):
        a = ops.knn_point(32, x, x[:, :1280])[0]
        b = ops.knn_point(32, x, x[:, :1280])[0]
        return x + (a.sum() + b.sum()) * 1e-12

    t1 = chain_time(jax.jit(knn_once), xyz)
    t2 = chain_time(jax.jit(knn_twice), xyz)
    print(f"knn x1: {t1:.2f} ms   knn x2 (same input): {t2:.2f} ms   "
          f"-> {'CSE' if t2 < 1.5 * t1 else 'NOT CSEd'}")

    # --- 2. Per-op at in-model shapes (pointasnl_sem_seg_res, B=4, N=10240).
    shapes = [
        ("layer0 self-knn32 10240x10240", lambda x: ops.knn_point(32, x, x)[0]),
        ("layer1 knn32 1280x10240", lambda x: ops.knn_point(32, x, x[:, :1280])[0]),
        ("layer2 knn32 320x1280", lambda x: ops.knn_point(32, x[:, :1280], x[:, :320])[0]),
        ("fps 10240->1280", lambda x: ops.farthest_point_sample(1280, x).astype(jnp.float32)),
        ("fps 1280->320", lambda x: ops.farthest_point_sample(320, x[:, :1280]).astype(jnp.float32)),
        ("three_nn 10240<-1280", lambda x: ops.three_nn(x, x[:, :1280])[0]),
    ]
    for name, f in shapes:
        g = jax.jit(lambda x, f=f: x + f(x).sum() * 1e-12)
        print(f"{name}: {chain_time(g, xyz):.2f} ms")

    # --- 3. Full step vs forward-only vs geometry-ablated step.
    from pointasnl_tpu.models import PointASNLSemSegRes
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    batch = {
        "points": xyz,
        "labels": jnp.asarray(rng.randint(0, 21, (B, N))),
        "smpw": jnp.ones((B, N), jnp.float32),
    }
    model = PointASNLSemSegRes(num_class=21)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, B, 2e5, 0.7))
    state = create_train_state(model, xyz, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(B, 2e5), task="seg",
                           donate=False)
    key = jax.random.PRNGKey(1)

    def train_chain(x):
        st2, m = step(state, dict(batch, points=x), key)
        return x + m["loss"] * 1e-12

    print(f"train step: {chain_time(jax.jit(train_chain), xyz, iters=10):.2f} ms")

    def fwd_chain(x):
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, training=False, bn_momentum=0.9)
        return x + logits.sum() * 1e-12

    print(f"forward only: {chain_time(jax.jit(fwd_chain), xyz, iters=10):.2f} ms")


if __name__ == "__main__":
    main()
