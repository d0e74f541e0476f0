"""Backward-pass decomposition of the seg train step (VERDICT r3 item 5).

Method: time value_and_grad with the differentiated set restricted to the
params of layers AT-OR-ABOVE level k of the forward graph. Gradients of a
layer's params need cotangents only at that layer's OUTPUT, so excluding
every layer below k lets XLA dead-code-eliminate their backward ops — the
time DELTA between successive cuts is the excluded segment's backward cost
(its param-grad matmuls + pass-through cotangent ops).

Timing is the fori-chained two-length slope of scripts/bench_train_step.py
(pure device time; dispatch overhead and host noise cancel in the slope).

Usage: python scripts/bench_backward.py [--dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# forward-graph order of top-level param groups for pointasnl_sem_seg_res
LEVELS = [
    ("layer0", ["layer0"]),
    ("layer1", ["layer1_1", "layer1_2"]),
    ("layer2", ["layer2_1", "layer2_2"]),
    ("layer3", ["layer3_1", "layer3_2"]),
    ("layer4", ["layer4_1", "layer4_2"]),
    ("fa_decoder_1_3", ["fa_layer1", "fa_layer2", "fa_layer3"]),
    ("fa_layer4", ["fa_layer4"]),
    ("head", ["fc1", "fc0"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, nargs=2, default=(2, 22))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pointasnl_tpu.models import PointASNLSemSegRes
    from pointasnl_tpu.nn import precision
    from pointasnl_tpu.nn.losses import segmentation_loss
    from pointasnl_tpu.train import bn_momentum_schedule, create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.state import make_optimizer

    jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    B, N = 4, 10240
    points = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, (B, N)))
    smpw = jnp.ones((B, N), jnp.float32)

    with precision.compute_dtype(args.dtype):
        model = PointASNLSemSegRes(num_class=21)
        tx = make_optimizer("adam", staircase_lr_schedule(1e-3, B, 2e5, 0.7))
        state = create_train_state(model, points, tx=tx, rng=jax.random.PRNGKey(0))
        bn_sched = bn_momentum_schedule(B, 2e5)
        key = jax.random.PRNGKey(1)

        def time_cut(cut_idx: int) -> float:
            """ms/step with levels[:cut_idx] frozen (excluded from grads)."""
            frozen_keys = [k for _, ks in LEVELS[:cut_idx] for k in ks]

            def split(params):
                frozen = {k: v for k, v in params.items() if k in frozen_keys}
                train = {k: v for k, v in params.items() if k not in frozen_keys}
                return train, frozen

            train0, frozen0 = split(state.params)

            def loss_fn(train_p, frozen_p, pts):
                params = dict(train_p, **frozen_p)
                (logits, ep), _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    pts, training=True, bn_momentum=bn_sched(0),
                    rngs={"dropout": key}, mutable=["batch_stats"],
                )
                loss, _ = segmentation_loss(
                    logits, labels, smpw, params, l1_xyz=ep["l1_xyz"],
                    uniform_weight=0.01, weights_decay=1e-4,
                )
                return loss

            def one(carry, _):
                # Perturb the INPUT by the running loss so no part of the
                # forward is loop-invariant: with constant points + frozen
                # lower params, XLA's while-loop LICM hoists the frozen
                # layers' dense forward out of the scan (measured: the
                # head-only cut timed BELOW the standalone forward), which
                # would contaminate every delta with that segment's
                # hoistable forward cost, not just its backward.
                train_p, frozen_p, salt = carry
                pts = points * (1.0 + salt * 1e-20)
                loss, g = jax.value_and_grad(loss_fn)(train_p, frozen_p, pts)
                # dependency-chain: nudge the trainable params by the grads
                new_train = jax.tree_util.tree_map(
                    lambda p, gg: p - 1e-9 * gg.astype(p.dtype), train_p, g
                )
                return (new_train, frozen_p, loss * 1e-9), loss

            def timed(n):
                @jax.jit
                def run(train_p, frozen_p):
                    (tp, _, _), losses = lax.scan(
                        one, (train_p, frozen_p, jnp.float32(0)), None, length=n
                    )
                    return losses[-1] + sum(
                        jnp.sum(l) for l in jax.tree_util.tree_leaves(tp)
                    )

                out = run(train0, frozen0)
                float(out)  # compile + warm
                t0 = time.perf_counter()
                out = run(train0, frozen0)
                float(out)
                return time.perf_counter() - t0

            n0, n1 = args.iters
            t0, t1 = timed(n0), timed(n1)
            return (t1 - t0) / (n1 - n0) * 1e3

        rows = []
        full = time_cut(0)
        rows.append(("full (all grads)", full, 0.0))
        prev = full
        for i in range(1, len(LEVELS)):
            name = LEVELS[i - 1][0]
            t = time_cut(i)
            rows.append((f"minus {name} bwd", t, prev - t))
            prev = t
            print(f"# {rows[-1][0]}: {t:.2f} ms (delta {rows[-1][2]:.2f} ms)",
                  file=sys.stderr, flush=True)

    print(f"\nseg_res B={B} N={N} {args.dtype} — backward decomposition "
          f"(fori slope, device time)")
    print(f"{'cut':<28} {'ms/step':>9} {'segment bwd ms':>15}")
    for name, t, d in rows:
        print(f"{name:<28} {t:9.2f} {d:15.2f}")


if __name__ == "__main__":
    main()
