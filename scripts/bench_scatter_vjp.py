"""Measure the gather-VJP scatter-add against a one-hot-matmul prototype.

The seg train step spends ~7.4 ms in XLA scatter-adds from the grouping
gathers (BENCH_OPS.md decomposition). The only MXU-expressible alternative
on TPU (Mosaic has no lane scatter) is a chunked one-hot matmul:
dPoints = onehot(idx)^T @ dOut, streamed over MK chunks. Its FLOP cost is
2*B*MK*N*C — profitable only where C is large relative to the scatter's
bandwidth cost. This script measures both, per layer shape, fetch-forced.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_scatter_vjp.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pointasnl_tpu.ops import geometry as g
from pointasnl_tpu.ops.scatter import onehot_scatter_add


def timeit(fn, *args, iters=20):
    # FULLY-JITTED chain (CLAUDE.md timing trap): the dout->dout dependency
    # lives inside one dispatch — an eager dependency between dispatches
    # adds ~hundreds of us/iter of tunnel round-trips and fabricates
    # regressions (BENCH_OPS.md round-3 postscript).
    step = jax.jit(lambda x: x + fn(x, *args[1:]).sum() * 1e-20)
    x = step(args[0])
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    shapes = [
        ("layer0_self", 4, 10240, 32, 10240, 6),
        ("layer1", 4, 1280, 32, 10240, 35),
        ("layer1_C64", 4, 1280, 32, 10240, 64),
    ]
    for name, B, M, K, N, C in shapes:
        pts = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M, K)).astype(np.int32))
        dout = jnp.asarray(rng.randn(B, M, K, C).astype(np.float32))

        def xla_vjp(dout_, idx_=idx, pts_=pts):
            _, vjp = jax.vjp(lambda p: g.group_point(p, idx_), pts_)
            return vjp(dout_)[0]

        def onehot(dout_, idx_=idx):
            return onehot_scatter_add(dout_.reshape(B, M * K, C),
                                      idx_.reshape(B, M * K), N,
                                      precision=lax.Precision.DEFAULT)

        def onehot_hi(dout_, idx_=idx):
            return onehot_scatter_add(dout_.reshape(B, M * K, C),
                                      idx_.reshape(B, M * K), N,
                                      precision=lax.Precision.HIGHEST)

        def onehot_split2(dout_, idx_=idx):
            return onehot_scatter_add(dout_.reshape(B, M * K, C),
                                      idx_.reshape(B, M * K), N,
                                      precision="split2")

        f1 = jax.jit(xla_vjp)
        f2 = jax.jit(onehot)
        f3 = jax.jit(onehot_hi)
        f4 = jax.jit(onehot_split2)
        a = np.asarray(f1(dout))
        b = np.asarray(f2(dout))
        c_ = np.asarray(f3(dout))
        d_ = np.asarray(f4(dout))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        err_hi = np.abs(a - c_).max() / (np.abs(a).max() + 1e-9)
        err_s2 = np.abs(a - d_).max() / (np.abs(a).max() + 1e-9)
        t_xla = timeit(f1, dout)
        t_oh = timeit(f2, dout)
        t_hi = timeit(f3, dout)
        t_s2 = timeit(f4, dout)
        flops = 2 * B * M * K * N * C
        print(
            f"{name}: xla_scatter {t_xla:.2f} ms | onehot-bf16 {t_oh:.2f} ms "
            f"(rel_err {err:.2e}) | onehot-HIGHEST {t_hi:.2f} ms "
            f"(rel_err {err_hi:.2e}) | onehot-split2 {t_s2:.2f} ms "
            f"(rel_err {err_s2:.2e}) [{flops/1e9:.0f} GFLOP]",
            flush=True,
        )


if __name__ == "__main__":
    main()
