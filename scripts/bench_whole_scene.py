"""Whole-scene single-pass inference at scales the dense attention map can't do.

Runs the segmentation forward pass on ONE chip at N far beyond the
reference's 8-10k crops, using the memory-bounded paths (blockwise NL
attention + chunked kNN). Optionally attempts the dense path at the same N
to demonstrate the OOM boundary (VERDICT r1 item 3's "bench line").

Usage: python scripts/bench_whole_scene.py [--n 131072] [--block 4096] [--try-dense]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def forward_ms(model, points) -> float:
    import jax

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points[:, :2048],  # init on a small cloud; params are shape-agnostic
        training=False,
        bn_momentum=0.9,
    )

    def one(pts):
        logits, _ = model.apply(variables, pts, training=False, bn_momentum=0.9)
        # chain through the input so fori iterations are data-dependent
        return pts + logits.sum() * 1e-12

    # Per-call fetch-forced timing (no fori chaining: wrapping the model in a
    # while loop makes XLA stack-allocate kernel outputs in scoped VMEM and
    # OOM at scene scale). ~2 ms/call of dispatch overhead is negligible here.
    run = jax.jit(one)
    x = run(points)
    float(x[0, 0, 0])  # compile + warm
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        x = run(x)
    _ = float(x[0, 0, 0])  # fetch = the only trustworthy completion barrier
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--try-dense", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLSemSeg

    n = args.n - args.n % 256
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(1, n, 3).astype(np.float32))
    print(f"device: {jax.devices()[0].device_kind}; scene size N={n}")

    model = PointASNLSemSeg(num_class=21, nl_kv_block_size=args.block)
    ms = forward_ms(model, points)
    print(
        f"[blockwise nl_block={args.block}] single-pass forward: {ms:.1f} ms "
        f"({n / ms * 1e3 / 1e6:.2f} M points/sec/chip)"
    )

    # The flash kernel holds K/V resident in VMEM — its domain is crop scale
    # (N <= ~16k); blockwise streaming covers whole-scene N.
    n_flash = min(n, 16384)
    flash = PointASNLSemSeg(num_class=21, nl_use_flash=True)
    ms = forward_ms(flash, points[:, :n_flash])
    print(
        f"[flash, N={n_flash}] single-pass forward: {ms:.1f} ms "
        f"({n_flash / ms * 1e3 / 1e6:.2f} M points/sec/chip)"
    )
    base = PointASNLSemSeg(num_class=21)
    ms = forward_ms(base, points[:, :n_flash])
    print(
        f"[dense NL, N={n_flash}] single-pass forward: {ms:.1f} ms "
        f"({n_flash / ms * 1e3 / 1e6:.2f} M points/sec/chip)"
    )

    if args.try_dense:
        try:
            dense = PointASNLSemSeg(num_class=21)
            ms = forward_ms(dense, points)
            print(f"[dense] single-pass forward: {ms:.1f} ms")
        except Exception as e:
            print(f"[dense] FAILED at N={n}: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
