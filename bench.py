"""Benchmark: end-to-end training throughput of the flagship config.

Runs the jitted ModelNet40 classification train step (pointasnl_cls with
adaptive sampling, B=16, N=1024 — the reference's training config,
train.py:18-35) on the available accelerator and reports points/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline note: the reference publishes no throughput numbers (SURVEY.md §6);
BASELINE.md sets our measured points/sec/chip as the number to establish.
vs_baseline is measured against a conservative estimate of the TF1+CUDA10
single-GPU reference step time for this config (~0.30 s/step for B=16,
dominated by the per-layer host kNN round trips), i.e. ~54.6k points/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_POINTS_PER_SEC = 16 * 1024 / 0.30  # ≈54,613 — see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLCls
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    batch_size, num_point = 16, 1024
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(batch_size, num_point, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, size=(batch_size,)))
    batch = {"points": points, "labels": labels}

    model = PointASNLCls(num_class=40, adaptive_sample=True)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, batch_size, 200000.0, 0.7))
    state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(
        bn_schedule=bn_momentum_schedule(batch_size, 200000.0), task="cls", donate=True
    )
    key = jax.random.PRNGKey(1)

    # Warmup / compile.
    state, _ = step(state, batch, key)
    jax.block_until_ready(state.params)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    points_per_sec = batch_size * num_point * n_iters / dt

    # Secondary: forward-only (inference) throughput, dependency-chained.
    @jax.jit
    def chained_predict(st, pts):
        logits, _ = st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            pts,
            training=False,
            bn_momentum=0.9,
        )
        return pts + logits.sum() * 1e-12

    x = chained_predict(state, points)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x = chained_predict(state, x)
    jax.block_until_ready(x)
    eval_points_per_sec = batch_size * num_point * n_iters / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "modelnet40_cls_train_points_per_sec_per_chip",
                "value": round(points_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(points_per_sec / REFERENCE_POINTS_PER_SEC, 3),
                "eval_points_per_sec_per_chip": round(eval_points_per_sec, 1),
                "train_step_ms": round(dt / n_iters * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
