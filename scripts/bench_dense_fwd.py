"""Dense-forward decomposition of the seg step (r5, SoL follow-up).

BENCH_OPS.md's speed-of-light table bounds the seg forward's dense residual
(47.3 − kNN/FPS ≈ 14.2 ms) at whole-segment granularity only. This measures
its composition by ABLATION: re-time the full forward with one submodule
class stubbed to a shape-correct constant — XLA dead-code-eliminates the
stubbed compute (and everything feeding only it), so baseline − ablated =
that family's cost including its share of fused neighbors.

Ablations (monkeypatched at trace time; params still come from the real
init — flax ignores unvisited subtrees):
  - NL:  every PointNonLocalCell returns zeros(B, M, out_channels) — kills
         the attention maps AND their K/V/Q 1x1 convs;
  - WN:  every WeightNetHidden returns ones(..., 32) — kills the weight-net
         MLP on grouped xyz (the einsum itself remains);
  - AS:  AdaptiveSampling returns the first-neighbor (the as_neighbor=0
         degenerate) — kills the sample-weights attention + renorm.

Methodology: fori/jit-chained slope (pure device time), the only timing
that holds through the tunneled runtime (BENCH_OPS.md).

Usage: python scripts/bench_dense_fwd.py  [--batch 4] [--n 10240]
"""

from __future__ import annotations

import argparse
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, ".")


def jit_chain_ms(make_scalar, x, iters=(2, 12)):
    """Slope of a fully-jitted self-composed chain — device time only.

    make_scalar(x) -> scalar; the chain injects it back at 1e-12 so every
    iteration depends on the last and nothing can be hoisted or overlapped.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def timed(n, salt):
        @jax.jit
        def run(x):
            def body(i, acc):
                return acc + make_scalar(acc) * 1e-12
            return jnp.sum(lax.fori_loop(0, n, body, x + salt * 1e-9))

        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return time.perf_counter() - t0

    lo, hi = iters
    return (timed(hi, 1) - timed(lo, 2)) / (hi - lo) * 1e3


@contextmanager
def stub(cls, fn):
    orig = cls.__call__
    cls.__call__ = fn
    try:
        yield
    finally:
        cls.__call__ = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=10240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.models import PointASNLSemSegRes
    from pointasnl_tpu.nn import pointasnl as pa
    from pointasnl_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(".jax_cache_tpu")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32))
    model = PointASNLSemSegRes(num_class=21)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, training=False, bn_momentum=0.9,
    )

    def fwd_scalar(pts):
        logits, _ = model.apply(variables, pts, training=False, bn_momentum=0.9)
        return logits.sum()

    def nl_stub(self, feature, query_feature, *, training, bn_momentum=0.9):
        B, M = query_feature.shape[:2]
        return jnp.zeros((B, M, self.out_channels), feature.dtype)

    def wn_stub(self, grouped_xyz, *, training=False, bn_momentum=0.9):
        return jnp.ones(
            grouped_xyz.shape[:-1] + (self.hidden_units[-1],),
            grouped_xyz.dtype,
        )

    def as_stub(self, grouped_xyz, grouped_feature, *, training, bn_momentum=0.9):
        return grouped_xyz[:, :, 0, :], grouped_feature[:, :, 0, :]

    results = {}
    results["full"] = jit_chain_ms(fwd_scalar, x)
    print(f"full forward: {results['full']:.2f} ms", flush=True)
    for name, cls, fn in [
        ("no_NL", pa.PointNonLocalCell, nl_stub),
        ("no_weightnet", pa.WeightNetHidden, wn_stub),
        ("no_AS", pa.AdaptiveSampling, as_stub),
    ]:
        with stub(cls, fn):
            results[name] = jit_chain_ms(fwd_scalar, x)
        share = results["full"] - results[name]
        print(f"{name}: {results[name]:.2f} ms  -> family share "
              f"{share:+.2f} ms", flush=True)

    print("\nSummary (B=%d, N=%d, f32, fori device time):" % (args.batch, args.n))
    for k, v in results.items():
        print(f"  {k:>13}: {v:7.2f} ms")


if __name__ == "__main__":
    main()
