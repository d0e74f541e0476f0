"""Trustworthy train-step timing: fori-chained inside ONE XLA program.

Python-loop chaining through the TPU tunnel inflates times by ~2 ms/step of
dispatch overhead, and standalone-op micro-benchmarks are unreliable in both
directions (see CLAUDE.md). This harness wraps N train steps in a single
lax.fori_loop program and reports the slope between two loop lengths — pure
device time, no dispatch. Used for backend A/B decisions (e.g. the Pallas
streaming kNN vs the XLA top_k path, VERDICT r1 item 2).

Usage: python scripts/bench_train_step.py [--config seg|cls] [--backend auto|jnp|pallas]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def step_time_ms(config: str, backend: str, iters=(2, 22), batch_size=None) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointasnl_tpu.models import PointASNLCls, PointASNLSemSegRes
    from pointasnl_tpu.ops.dispatch import ops_backend
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    rng = np.random.RandomState(0)
    if config == "seg":
        B, N = batch_size or 4, 10240
        points = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        batch = {
            "points": points,
            "labels": jnp.asarray(rng.randint(0, 21, (B, N))),
            "smpw": jnp.ones((B, N), jnp.float32),
        }
        model = PointASNLSemSegRes(num_class=21)
        task = "seg"
    else:
        B, N = batch_size or 16, 1024
        points = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        batch = {
            "points": points,
            "labels": jnp.asarray(rng.randint(0, 40, (B,))),
        }
        model = PointASNLCls(num_class=40, adaptive_sample=True)
        task = "cls"

    with ops_backend(backend):
        tx = make_optimizer("adam", staircase_lr_schedule(1e-3, B, 2e5, 0.7))
        state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(
            bn_schedule=bn_momentum_schedule(B, 2e5), task=task, donate=False
        )
        key = jax.random.PRNGKey(1)

        def timed(n, salt):
            @jax.jit
            def run(state, batch, key):
                out = lax.fori_loop(
                    0, n, lambda i, st: step(st, batch, key)[0], state
                )
                # A checksum that cannot exist without executing every step;
                # fetching it to host is the only trustworthy completion
                # barrier through the tunnel (block_until_ready and repeat
                # dispatches have both been observed to lie).
                checksum = sum(
                    jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out.params)
                )
                return checksum

            # Warm-up and timed calls use different inputs: byte-identical
            # repeat dispatches are served from a cache.
            float(run(state, batch, jax.random.PRNGKey(900 + salt)))
            t0 = time.perf_counter()
            float(run(state, batch, jax.random.fold_in(key, salt)))
            return time.perf_counter() - t0

        lo, hi = iters
        return (timed(hi, 1) - timed(lo, 2)) / (hi - lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="seg", choices=["seg", "cls"])
    ap.add_argument(
        "--backend", default=None,
        help="auto|jnp|pallas; default compares auto vs pallas",
    )
    args = ap.parse_args()
    backends = [args.backend] if args.backend else ["auto", "pallas"]
    for be in backends:
        ms = step_time_ms(args.config, be)
        print(f"[{args.config}] backend={be}: {ms:.3f} ms/step (device time)")


if __name__ == "__main__":
    main()
