"""Micro-benchmarks for the geometry op layer (device + host).

The parity analog of the reference's scattered __main__ timing blocks
(tf_ops/*/tf_*.py, utils/nearest_neighbors/test.py, interpolate.cpp main).
Timings are dependency-chained so async dispatch cannot overlap iterations.

Usage: python scripts/bench_ops.py [--backend jnp|pallas|auto]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_time(fn, x, iters=20):
    """Per-iteration device time of `fn` (same-shape in/out), trustworthily.

    Through the tunneled TPU runtime, block_until_ready returns before
    execution completes and byte-identical repeat dispatches are served from
    a cache — both produce fictional timings (in BOTH directions). The only
    barrier observed to hold: FETCH a value computed from the final result.
    The chain is data-dependent (each call consumes the previous output), so
    the fetched scalar cannot exist until every iteration ran.
    """
    import jax

    out = fn(x)
    float(out.ravel()[0])  # compile + warm, fetch-forced
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(x.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu import ops
    from pointasnl_tpu.ops.dispatch import ops_backend

    rng = np.random.RandomState(0)
    configs = [("cls", 16, 1024, 512, 32), ("seg", 4, 10240, 1280, 32)]

    with ops_backend(args.backend):
        for name, B, N, M, K in configs:
            xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))

            fps = jax.jit(
                lambda x, m=M: x + ops.farthest_point_sample(m, x).sum() * 1e-12
            )
            print(f"[{name}] fps({M}) on (B{B},N{N}): {chain_time(fps, xyz):.3f} ms")

            knn = jax.jit(
                lambda x, m=M, k=K: x + ops.knn_point(k, x, x[:, :m])[0].sum() * 1e-12
            )
            print(f"[{name}] knn{K} {M}x{N}: {chain_time(knn, xyz):.3f} ms")

            ball = jax.jit(
                lambda x, m=M, k=K: x
                + ops.query_ball_point(0.2, k, x, x[:, :m])[0].sum().astype(jnp.float32) * 1e-12
            )
            print(f"[{name}] ball{K} {M}x{N}: {chain_time(ball, xyz):.3f} ms")

            interp = jax.jit(
                lambda x, m=M: x
                + ops.three_interpolate_idw(x, x[:, :m], x[:, :m]).sum() * 1e-12
            )
            print(f"[{name}] three_interp {N}<-{M}: {chain_time(interp, xyz):.3f} ms")

    # Pallas streaming kNN vs the XLA top_k path, head to head (VERDICT r1
    # item 2: adopt only if faster; numbers recorded in BENCH_OPS.md).
    from pointasnl_tpu.ops import geometry as g

    try:
        from pointasnl_tpu.ops.pallas import knn as pknn

        for name, B, N, M, K in configs:
            xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
            jknn = jax.jit(
                lambda x, m=M, k=K: x + g.knn_point(k, x, x[:, :m])[0].sum() * 1e-12
            )
            t_jnp = chain_time(jknn, xyz)
            cknn = jax.jit(
                lambda x, m=M, k=K: x + pknn.knn_point(k, x, x[:, :m])[0].sum() * 1e-12
            )
            t_pal = chain_time(cknn, xyz)
            print(
                f"[{name}] knn{K} {M}x{N} head-to-head: "
                f"xla={t_jnp:.3f} ms pallas={t_pal:.3f} ms "
                f"({'pallas' if t_pal < t_jnp else 'xla'} wins {max(t_jnp,t_pal)/max(min(t_jnp,t_pal),1e-9):.2f}x)"
            )
    except Exception as e:  # pallas unavailable off-TPU without interpret mode
        print(f"[pallas knn] skipped: {type(e).__name__}: {e}")

    # host kNN (sklearn KDTree) for comparison — the reference's nanoflann role
    from pointasnl_tpu.ops.host_knn import knn_batch

    pts = rng.randn(16, 8192, 3).astype(np.float32)
    t0 = time.perf_counter()
    knn_batch(pts, pts[:, :1024], 16)
    print(f"[host] KDTree knn16 1024x8192 x16: {(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
