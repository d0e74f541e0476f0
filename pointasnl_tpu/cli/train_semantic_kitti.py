"""SemanticKITTI segmentation trainer (block-crop pipeline) — rebuild of
SemanticKITTI/train_semantic_kitti.py.

Same recipe: B=6, N=8192, 20 classes, weighted CE + repulsion, per-batch
z-rotation (no normalization — KITTI coordinates are metric,
train_semantic_kitti.py:244), optional remission channel (feature_channel=1),
block-tiled whole-scan eval, latest/best checkpoints.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from pointasnl_tpu.cli.seg_common import (
    SegEvalAccumulator,
    add_dp_arg,
    add_nl_args,
    nl_kwargs,
    pad_seg_batch,
    setup_dp,
)

KITTI_LABEL_TO_CAT = {
    0: "unlabeled", 1: "car", 2: "bicycle", 3: "motorcycle", 4: "truck",
    5: "other-vehicle", 6: "person", 7: "bicyclist", 8: "motorcyclist",
    9: "road", 10: "parking", 11: "sidewalk", 12: "other-ground",
    13: "building", 14: "fence", 15: "vegetation", 16: "trunk",
    17: "terrain", 18: "pole", 19: "traffic-sign",
}


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_semantic_kitti")
    p.add_argument("--data", default="data/kitti/dataset/")
    p.add_argument("--model", default="pointasnl_sem_seg")
    p.add_argument("--log_dir", default="logs/semantic_kitti")
    p.add_argument("--pretrain_dir", default=None)
    p.add_argument("--num_point", type=int, default=8192)
    p.add_argument("--max_epoch", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="adam", choices=["adam", "momentum"])
    p.add_argument("--decay_step", type=int, default=200000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    add_nl_args(p)
    add_dp_arg(p)
    p.add_argument(
        "--max_to_keep", type=int, default=100,
        help="retained epoch-numbered checkpoints (<=0 keeps all)",
    )
    p.add_argument("--with_remission", action="store_true")
    p.add_argument("--config_file", default=None, help="external semantic-kitti.yaml")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--steps_per_epoch", type=int, default=0, help="0 = full dataset")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true")
    p.add_argument(
        "--profile", action="store_true",
        help="trace the first train steps of epoch 0 into <log_dir>/profile "
        "(view with Perfetto/TensorBoard)",
    )
    return p.parse_args(argv)


def main(argv=None):
    flags = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.data import provider
    from pointasnl_tpu.data.semantic_kitti import SemanticKittiDataset
    from pointasnl_tpu.models import get_model_class
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_eval_step,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.checkpoint import (
        CheckpointManager,
        checkpoint_exists,
        restore_checkpoint,
    )
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.utils import Logger, save_args, snapshot_sources

    log = Logger(flags.log_dir)
    save_args(flags, flags.log_dir)
    snapshot_sources(flags.log_dir, flags.model, extra_modules=(__file__,))
    rs = np.random.RandomState(flags.seed)
    feature_channel = 1 if flags.with_remission else 0

    train_ds = SemanticKittiDataset(
        flags.data,
        sample_points=flags.num_point,
        split="train",
        with_remission=flags.with_remission,
        config_file=flags.config_file,
        random_state=rs,
    )
    val_ds = SemanticKittiDataset(
        flags.data,
        sample_points=flags.num_point,
        split="valid",
        with_remission=flags.with_remission,
        config_file=flags.config_file,
        random_state=rs,
    )

    model = get_model_class(flags.model)(
        num_class=flags.num_classes, feature_channel=feature_channel,
        **nl_kwargs(flags),
    )
    lr_sched = staircase_lr_schedule(
        flags.learning_rate, flags.batch_size, float(flags.decay_step), flags.decay_rate
    )
    bn_sched = bn_momentum_schedule(flags.batch_size, float(flags.decay_step))
    tx = make_optimizer(flags.optimizer, lr_sched, momentum=flags.momentum)

    example = jnp.zeros((flags.batch_size, flags.num_point, 3 + feature_channel), jnp.float32)
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(flags.seed))
    if flags.pretrain_dir and checkpoint_exists(flags.pretrain_dir, "latest"):
        state = restore_checkpoint(state, flags.pretrain_dir, "latest")
        log(f"restored pretrain from {flags.pretrain_dir}")
    elif checkpoint_exists(flags.log_dir, "latest"):
        state = restore_checkpoint(state, flags.log_dir, "latest")
        log(f"resumed from step {int(state.step)}")

    state, place = setup_dp(flags, state, log)
    train_step = make_train_step(bn_schedule=bn_sched, task="seg", uniform_weight=0.01)
    eval_step = make_eval_step(task="seg")
    dropout_rng = jax.random.PRNGKey(flags.seed + 1)

    def get_batch(dataset, idxs, start, end):
        bsize = end - start
        bd = np.zeros((bsize, flags.num_point, 3 + feature_channel), np.float32)
        bl = np.zeros((bsize, flags.num_point), np.int32)
        bw = np.zeros((bsize, flags.num_point), np.float32)
        for i in range(bsize):
            ps, seg, smpw = dataset[idxs[i + start]]
            bd[i], bl[i], bw[i] = ps, seg, smpw
        return bd, bl, bw

    ckpt_mgr = CheckpointManager(
        flags.log_dir,
        max_to_keep=flags.max_to_keep if flags.max_to_keep > 0 else None,
    )
    best_iou = 0.0
    max_epoch = 2 if flags.debug else flags.max_epoch
    for epoch in range(max_epoch):
        log(f"**** EPOCH {epoch:03d} ****")
        t0 = time.time()
        train_idxs = np.arange(len(train_ds))
        rs.shuffle(train_idxs)
        num_batches = len(train_ds) // flags.batch_size
        if flags.steps_per_epoch:
            num_batches = min(num_batches, flags.steps_per_epoch)
        if flags.debug:
            num_batches = 1
        loss_sum = 0.0

        def train_batches():
            for b in range(num_batches):
                bd, bl, bw = get_batch(
                    train_ds, train_idxs, b * flags.batch_size, (b + 1) * flags.batch_size
                )
                bd[:, :, :3] = provider.rotate_point_cloud_z(bd[:, :, :3], random_state=rs)
                yield bd, bl, bw

        from pointasnl_tpu.data.grid_pipeline import Prefetcher
        from pointasnl_tpu.train.profiling import StepTraceWindow

        tracer = StepTraceWindow(
            os.path.join(flags.log_dir, "profile"),
            enabled=flags.profile and epoch == 0, log=log,
        )
        try:
            for bd, bl, bw in Prefetcher(train_batches(), capacity=4):
                tracer.before()
                state, metrics = train_step(
                    state,
                    {
                        "points": place(bd, jnp.float32),
                        "labels": place(bl),
                        "smpw": place(bw),
                    },
                    dropout_rng,
                )
                tracer.after(state.params)
                # on-device accumulation: a host fetch per step costs ~35 ms
                # through the tunneled runtime (BENCH_OPS.md)
                loss_sum = loss_sum + metrics["loss"]
        finally:
            tracer.close(state.params)
        log(
            f"train loss {loss_sum / max(num_batches, 1):.4f} "
            f"({time.time() - t0:.1f}s, lr {float(lr_sched(state.step)):.6f})"
        )

        # --- eval on random crops of the valid split ---
        acc = SegEvalAccumulator(flags.num_classes)
        val_idxs = np.arange(len(val_ds))
        rs.shuffle(val_idxs)
        val_batches = 1 if flags.debug else max(len(val_ds) // flags.batch_size // 10, 1)
        for b in range(val_batches):
            bd, bl, bw = get_batch(
                val_ds, val_idxs, b * flags.batch_size, (b + 1) * flags.batch_size
            )
            bd[:, :, :3] = provider.rotate_point_cloud_z(bd[:, :, :3], random_state=rs)
            bd, bl, bw, bsize = pad_seg_batch(bd, bl, bw, flags.batch_size)
            logits, _ = eval_step(
                state, {"points": place(bd), "labels": place(bl)}
            )
            preds = np.asarray(jnp.argmax(logits, -1))[:bsize]
            acc.update(preds, bl[:bsize], bw[:bsize])
        iou = acc.miou()
        log(f"eval point avg class IoU: {iou:.5f} acc: {acc.accuracy():.5f}")

        is_best = iou >= best_iou
        if is_best:
            best_iou = iou
            log(f"new best mIoU: {best_iou:.5f}")
        ckpt_mgr.save(state, epoch, is_best=is_best)
    return best_iou


if __name__ == "__main__":
    main()
