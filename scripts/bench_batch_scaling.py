"""Batch-scaling decomposition of the seg step (VERDICT r3 item 6).

BENCH_OPS.md r3: scannet_seg_res_b16 f32 = 315.4 ms (519k pts/s) vs B4's
74.4 ms (551k) — a ~6% per-point loss at 4x batch. This isolates WHICH
component scales super-linearly with B: the full step, the forward alone,
and the batched geometry kernels (FPS, layer0 self-kNN, layer1 kNN) are
each timed at B in {4, 8, 16} with the fori/jit-chained slope method
(pure device time; see BENCH_OPS.md methodology notes).

Usage: python scripts/bench_batch_scaling.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

BATCHES = (4, 8, 16)
N = 10240
NPOINT = 1280
K = 32


def jit_chain_ms(make_fn, x, iters=(2, 12)):
    """Slope of a fully-jitted self-composed chain — device time only."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def timed(n, salt):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = make_fn(acc)
                return acc + y * 1e-12
            return jnp.sum(lax.fori_loop(0, n, body, x + salt * 1e-9))

        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return time.perf_counter() - t0

    lo, hi = iters
    return (timed(hi, 1) - timed(lo, 2)) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu import ops

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, "scripts")
    from bench_train_step import step_time_ms  # noqa: E402

    rng = np.random.RandomState(0)

    rows = []
    for B in BATCHES:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))

        def fps_fn(x):
            idx = ops.farthest_point_sample(NPOINT, x)
            return jnp.zeros_like(x) + idx.sum() * 1e-12

        def knn0_fn(x):
            _, idx = ops.knn_point(K, x, x)  # layer0 self-kNN (N x N)
            return jnp.zeros_like(x) + idx.sum() * 1e-12

        def knn1_fn(x):
            q = x[:, :NPOINT]
            _, idx = ops.knn_point(K, x, q)  # layer1 shape (NPOINT x N)
            return jnp.zeros_like(x) + idx.sum() * 1e-12

        fps = jit_chain_ms(fps_fn, xyz)
        knn0 = jit_chain_ms(knn0_fn, xyz)
        knn1 = jit_chain_ms(knn1_fn, xyz)
        rows.append((B, fps, knn0, knn1))
        print(f"# B={B}: FPS {fps:.2f} ms, self-kNN {knn0:.2f} ms, "
              f"layer1-kNN {knn1:.2f} ms", file=sys.stderr, flush=True)

    print(f"\nper-op batch scaling (N={N}, npoint={NPOINT}, k={K}; "
          f"device-time ms, ratio vs linear-from-B4 in parens)")
    print(f"{'B':>3} {'FPS':>14} {'self-kNN':>16} {'layer1-kNN':>16}")
    b4 = rows[0]
    for B, fps, knn0, knn1 in rows:
        s = B / 4
        print(f"{B:3d} {fps:8.2f} ({fps/(b4[1]*s):4.2f}) "
              f"{knn0:8.2f} ({knn0/(b4[2]*s):4.2f}) "
              f"{knn1:8.2f} ({knn1/(b4[3]*s):4.2f})")

    # forward-only (loss value, no grad) at each B — same chained method
    from pointasnl_tpu.models import PointASNLSemSegRes
    from pointasnl_tpu.nn.losses import segmentation_loss

    model = PointASNLSemSegRes(num_class=21)
    fwd_rows = []
    for B in BATCHES:
        points = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 21, (B, N)))
        smpw = jnp.ones((B, N), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            points, training=True,
        )

        def fwd_fn(x, _v=variables, _l=labels, _w=smpw):
            logits, end_points = model.apply(_v, x, training=False)
            loss, _ = segmentation_loss(
                logits, _l, _w, _v["params"], l1_xyz=end_points["l1_xyz"]
            )
            return jnp.zeros_like(x) + loss * 1e-12

        ms = jit_chain_ms(fwd_fn, points, iters=(2, 10))
        fwd_rows.append((B, ms))
        print(f"# B={B}: forward {ms:.2f} ms", file=sys.stderr, flush=True)

    print("\nforward-only (fori slope; ratio vs linear-from-B4):")
    f4 = fwd_rows[0][1]
    for B, ms in fwd_rows:
        print(f"B={B:<3d} {ms:8.2f} ms ({ms/(f4*B/4):4.2f})")

    print("\nfull train step (fori slope):", flush=True)
    from bench_train_step import step_time_ms as _sts  # noqa: F811

    step_rows = []
    for B in BATCHES:
        it = (2, 12) if B >= 16 else (2, 22)
        ms = _sts("seg", "auto", iters=it, batch_size=B)
        step_rows.append((B, ms))
        print(f"# B={B}: step {ms:.2f} ms", file=sys.stderr, flush=True)
    s4 = step_rows[0][1]
    for B, ms in step_rows:
        print(f"B={B:<3d} {ms:8.2f} ms ({ms/(s4*B/4):4.2f} vs linear; "
              f"{B*N/ms*1e3/1e3:.0f}k pts/s)")


if __name__ == "__main__":
    main()
