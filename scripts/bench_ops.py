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
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
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

    # host kNN (sklearn KDTree) for comparison — the reference's nanoflann role
    from pointasnl_tpu.ops.host_knn import knn_batch

    pts = rng.randn(16, 8192, 3).astype(np.float32)
    t0 = time.perf_counter()
    knn_batch(pts, pts[:, :1024], 16)
    print(f"[host] KDTree knn16 1024x8192 x16: {(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
