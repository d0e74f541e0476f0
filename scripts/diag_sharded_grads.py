"""Diagnose sharded-vs-monolithic training-grad differences (item 7).

Prints the per-leaf relative-error distribution, the global grad cosine and
norm ratio, and (with --x64) repeats the comparison in float64 — if the
errors collapse there, the f32 discrepancy is rounding noise amplified by
training-mode BN, not a sharding-transpose bug.

Usage: python scripts/diag_sharded_grads.py [--x64]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--eval_mode", action="store_true",
                    help="differentiate the EVAL-mode loss (frozen BN stats; "
                         "no sync-BN pmean in the grad path) — isolates the "
                         "training-BN pmean transpose from everything else")
    args = ap.parse_args()

    import os

    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from pointasnl_tpu.models import PointASNLSemSegRes
    from pointasnl_tpu.nn.losses import segmentation_loss
    from pointasnl_tpu.parallel import make_mesh
    from pointasnl_tpu.parallel.whole_scene import scene_apply_sharded
    from pointasnl_tpu.train import create_train_state
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.train import staircase_lr_schedule

    N_DEV, NUM_CLASS, BN_M = 8, 5, 0.9
    dtype = jnp.float64 if args.x64 else jnp.float32
    mesh = make_mesh(num_devices=N_DEV, axis_names=("data",))
    rng = np.random.RandomState(0)
    n = 256 * N_DEV
    points = jnp.asarray(rng.randn(1, n, 3), dtype)
    labels = jnp.asarray(rng.randint(0, NUM_CLASS, size=(1, n)))
    smpw = jnp.asarray(1.0 + rng.rand(1, n), dtype)
    model = PointASNLSemSegRes(num_class=NUM_CLASS, dropout_keep=1.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, training=False, bn_momentum=BN_M,
    )
    if args.x64:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables,
        )

    training = not args.eval_mode

    def mono_fwd(params):
        if training:
            (logits, ep), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                points, training=True, bn_momentum=BN_M,
                rngs={"dropout": jax.random.PRNGKey(9)},
                mutable=["batch_stats"],
            )
        else:
            logits, ep = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                points, training=False, bn_momentum=BN_M,
            )
        return logits, ep["l1_xyz"]

    def shrd_fwd(params):
        logits, l1_xyz, _ = scene_apply_sharded(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, mesh, training=training, bn_momentum=BN_M,
            dropout_rng=None, num_class=NUM_CLASS, nl_kv_block_size=None,
        )
        return logits, l1_xyz

    def make_loss(fwd):
        def loss(params):
            logits, l1_xyz = fwd(params)
            l, _ = segmentation_loss(
                logits, labels, smpw, params, l1_xyz=l1_xyz,
                uniform_weight=0.01, weights_decay=1e-4,
            )
            return l
        return loss

    # primal comparison first: localizes forward vs backward
    lm_logits, _ = jax.jit(mono_fwd)(variables["params"])
    ls_logits, _ = jax.jit(shrd_fwd)(variables["params"])
    dl = np.abs(np.asarray(ls_logits) - np.asarray(lm_logits))
    print(f"[training={training}] logits max abs diff: {dl.max():.3e} "
          f"(scale {np.abs(np.asarray(lm_logits)).max():.3e})")

    g_m = jax.jit(jax.grad(make_loss(mono_fwd)))(variables["params"])
    g_s = jax.jit(jax.grad(make_loss(shrd_fwd)))(variables["params"])

    flat_m = jax.tree_util.tree_flatten_with_path(g_m)[0]
    flat_s = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(g_s)[0]}
    errs = []
    sq_dot = sq_m = sq_s = 0.0
    for path, gm in flat_m:
        gs = flat_s[jax.tree_util.keystr(path)]
        gm, gs = np.asarray(gm, np.float64), np.asarray(gs, np.float64)
        sq_dot += float(np.sum(gm * gs))
        sq_m += float(np.sum(gm * gm))
        sq_s += float(np.sum(gs * gs))
        scale = max(np.abs(gm).max(), 1e-9)
        errs.append((np.abs(gs - gm).max() / scale, jax.tree_util.keystr(path)))
    errs.sort(reverse=True)
    print(f"x64={args.x64}  leaves={len(errs)}")
    print("top-10 per-leaf rel errors:")
    for e, p in errs[:10]:
        print(f"  {e:.3e}  {p}")
    import statistics
    med = statistics.median(e for e, _ in errs)
    cos = sq_dot / max(np.sqrt(sq_m * sq_s), 1e-300)
    print(f"median leaf err: {med:.3e}")
    print(f"global cos: {cos:.8f}  norm ratio: {np.sqrt(sq_s / sq_m):.6f}")


if __name__ == "__main__":
    main()
