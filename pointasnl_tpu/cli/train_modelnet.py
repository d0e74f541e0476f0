"""ModelNet40 classification trainer — the TPU rebuild of train.py.

Same flag surface and training recipe (train.py:18-35,95-113,208-264):
B=16, N=1024, adam with staircase LR decay (x0.7 / 200k samples, floor 1e-5),
scheduled BN momentum 0.5->0.99, numpy augmentation pipeline per batch
(rotation -> scale -> shift -> shared point shuffle -> random dropout),
per-epoch eval, best+latest checkpoints, auto-resume from latest.

The whole optimization step (FPS/kNN/attention/backward/adam/BN) is ONE jitted
XLA program on the accelerator; the host only feeds augmented numpy batches.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_modelnet")
    p.add_argument("--data", default="data/modelnet40_normal_resampled", help="dataset root")
    p.add_argument("--log_dir", default="logs/modelnet_cls", help="log/checkpoint dir")
    p.add_argument("--model", default="pointasnl_cls")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--max_epoch", type=int, default=251)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--optimizer", default="adam", choices=["adam", "momentum"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--decay_step", type=int, default=200000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument(
        "--max_to_keep", type=int, default=100,
        help="retained epoch-numbered checkpoints (<=0 keeps all)",
    )
    p.add_argument("--AS", action="store_true", help="adaptive sampling")
    p.add_argument("--normal", action="store_true", help="use normals as features")
    p.add_argument("--rotation", action="store_true", help="rotation augmentation")
    p.add_argument("--uniform", action="store_true", help="FPS resampling in the dataset")
    p.add_argument("--num_classes", type=int, default=40)
    p.add_argument(
        "--precision", default="float32",
        choices=["float32", "bfloat16"],
        help="compute dtype for the jitted model (bf16 = the MXU "
        "throughput path; see tests/test_precision.py for the "
        "numerics gate and VALIDATION.md for the recipe-level gate)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true", help="1 batch per epoch, 2 epochs")
    p.add_argument(
        "--profile", action="store_true",
        help="trace the first train steps of epoch 0 into <log_dir>/profile "
        "(view with Perfetto/TensorBoard)",
    )
    p.add_argument(
        "--dp",
        action="store_true",
        help="data-parallel: shard the batch over all local devices (batch_size "
        "must be divisible by the device count)",
    )
    return p.parse_args(argv)


def pad_batch(batch_data, batch_label, batch_size):
    """Pad a short tail batch up to the static batch size (repeat row 0)."""
    bsize = batch_data.shape[0]
    if bsize == batch_size:
        return batch_data, batch_label, bsize
    data = np.concatenate([batch_data, np.repeat(batch_data[:1], batch_size - bsize, 0)], 0)
    label = np.concatenate([batch_label, np.repeat(batch_label[:1], batch_size - bsize, 0)], 0)
    return data, label, bsize


def augment_batch(batch_data, flags, rs):
    from pointasnl_tpu.data import provider

    if flags.rotation:
        if flags.normal:
            batch_data = provider.rotate_point_cloud_with_normal(batch_data, random_state=rs)
            batch_data = provider.rotate_perturbation_point_cloud_with_normal(
                batch_data, random_state=rs
            )
        else:
            batch_data = provider.rotate_point_cloud(batch_data, random_state=rs)
            batch_data = provider.rotate_perturbation_point_cloud(batch_data, random_state=rs)
    batch_data = np.asarray(batch_data)
    batch_data[:, :, 0:3] = provider.random_scale_point_cloud(
        batch_data[:, :, 0:3], random_state=rs
    )
    batch_data[:, :, 0:3] = provider.shift_point_cloud(batch_data[:, :, 0:3], random_state=rs)
    batch_data = provider.shuffle_points(batch_data, random_state=rs)
    batch_data = provider.random_point_dropout(batch_data, random_state=rs)
    return batch_data


def main(argv=None):
    flags = parse_args(argv)
    from pointasnl_tpu.nn import precision

    # the override must cover trace time (nn/precision.py), and every
    # (re)trace happens inside the body below
    with precision.compute_dtype(flags.precision):
        return _main_body(flags)


def _main_body(flags):

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.data.modelnet import ModelNetDataset
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

    from pointasnl_tpu.train.summary import MetricWriter

    log = Logger(flags.log_dir)
    save_args(flags, flags.log_dir)
    snapshot_sources(flags.log_dir, flags.model, extra_modules=(__file__,))
    train_writer = MetricWriter.create(flags.log_dir, "train", backend="csv")
    test_writer = MetricWriter.create(flags.log_dir, "test", backend="csv")
    rs = np.random.RandomState(flags.seed)

    train_ds = ModelNetDataset(
        flags.data,
        batch_size=flags.batch_size,
        npoints=flags.num_point,
        split="train",
        normal_channel=flags.normal,
        uniform=flags.uniform,
        random_state=rs,
    )
    test_ds = ModelNetDataset(
        flags.data,
        batch_size=flags.batch_size,
        npoints=flags.num_point,
        split="test",
        normal_channel=flags.normal,
        uniform=flags.uniform,
        random_state=rs,
    )

    model_cls = get_model_class(flags.model)
    model = model_cls(
        num_class=flags.num_classes, use_normal=flags.normal, adaptive_sample=flags.AS
    )

    lr_sched = staircase_lr_schedule(
        flags.learning_rate, flags.batch_size, float(flags.decay_step), flags.decay_rate
    )
    bn_sched = bn_momentum_schedule(flags.batch_size, float(flags.decay_step))
    tx = make_optimizer(flags.optimizer, lr_sched, momentum=flags.momentum)

    example = jnp.zeros(
        (flags.batch_size, flags.num_point, train_ds.num_channel()), jnp.float32
    )
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(flags.seed))
    if checkpoint_exists(flags.log_dir, "latest"):
        state = restore_checkpoint(state, flags.log_dir, "latest")
        log(f"resumed from latest checkpoint at step {int(state.step)}")

    train_step = make_train_step(bn_schedule=bn_sched, task="cls")
    eval_step = make_eval_step(task="cls")
    dropout_rng = jax.random.PRNGKey(flags.seed + 1)

    # Optional data parallelism: replicate state, shard each batch over the
    # 'data' mesh axis; the jitted step then runs SPMD (psum grads, sync-BN).
    place_batch = jnp.asarray
    if flags.dp:
        from pointasnl_tpu.parallel import setup_data_parallel

        state, place_batch = setup_data_parallel(state, flags.batch_size, log)

    max_epoch = 2 if flags.debug else flags.max_epoch
    ckpt_mgr = CheckpointManager(
        flags.log_dir,
        max_to_keep=flags.max_to_keep if flags.max_to_keep > 0 else None,
    )
    best_acc = 0.0
    for epoch in range(max_epoch):
        log(f"**** EPOCH {epoch:03d} ****")
        # --- train (host augmentation overlapped with device compute) ---
        t0 = time.time()
        total_correct = total_seen = 0
        loss_sum = 0.0
        num_batches = 0

        def augmented_batches():
            while train_ds.has_next_batch():
                batch_data, batch_label = train_ds.next_batch()
                batch_data = augment_batch(batch_data, flags, rs)
                yield pad_batch(
                    batch_data.astype(np.float32), batch_label, flags.batch_size
                )
                if flags.debug:
                    break

        from pointasnl_tpu.data.grid_pipeline import Prefetcher
        from pointasnl_tpu.train.profiling import StepTraceWindow

        tracer = StepTraceWindow(
            os.path.join(flags.log_dir, "profile"),
            enabled=flags.profile and epoch == 0,
            steps=5,
            log=log,
        )
        try:
            for batch_data, batch_label, bsize in Prefetcher(
                augmented_batches(), capacity=4
            ):
                tracer.before()
                state, metrics = train_step(
                    state,
                    {"points": place_batch(batch_data), "labels": place_batch(batch_label)},
                    dropout_rng,
                )
                # accumulate ON DEVICE -- a host fetch per step costs
                # ~35 ms through the tunneled runtime (BENCH_OPS.md)
                loss_sum = loss_sum + metrics["loss"]
                total_correct = total_correct + metrics["accuracy"] * flags.batch_size
                total_seen += bsize
                num_batches += 1
                tracer.after(state.params)
        finally:
            tracer.close(state.params)
        train_ds.reset()
        log(
            f"train loss {loss_sum / max(num_batches, 1):.4f} "
            f"acc {total_correct / max(total_seen, 1):.4f} "
            f"({time.time() - t0:.1f}s, lr {float(lr_sched(state.step)):.6f})"
        )
        train_writer.scalars(
            {
                "loss": loss_sum / max(num_batches, 1),
                "accuracy": total_correct / max(total_seen, 1),
                "learning_rate": float(lr_sched(state.step)),
                "bn_decay": float(bn_sched(state.step)),
            },
            int(state.step),
        )
        train_writer.flush()

        # --- eval ---
        total_correct = total_seen = 0
        class_seen = np.zeros(flags.num_classes)
        class_correct = np.zeros(flags.num_classes)
        while test_ds.has_next_batch():
            batch_data, batch_label = test_ds.next_batch()
            batch_data, batch_label, bsize = pad_batch(
                batch_data.astype(np.float32), batch_label, flags.batch_size
            )
            logits, _ = eval_step(
                state,
                {"points": place_batch(batch_data), "labels": place_batch(batch_label)},
            )
            preds = np.asarray(jnp.argmax(logits, -1))[:bsize]
            labels = batch_label[:bsize]
            total_correct += int(np.sum(preds == labels))
            total_seen += bsize
            for i in range(bsize):
                class_seen[labels[i]] += 1
                class_correct[labels[i]] += int(preds[i] == labels[i])
            if flags.debug:
                break
        test_ds.reset()
        acc = total_correct / max(total_seen, 1)
        avg_class_acc = float(np.mean(class_correct / np.maximum(class_seen, 1)))
        log(f"eval accuracy: {acc:.4f} avg class acc: {avg_class_acc:.4f}")
        test_writer.scalars(
            {"accuracy": acc, "avg_class_accuracy": avg_class_acc}, int(state.step)
        )
        test_writer.flush()

        is_best = acc >= best_acc  # >= so a "best" checkpoint always exists
        if is_best:
            best_acc = acc
            log(f"new best accuracy: {best_acc:.4f}")
        ckpt_mgr.save(state, epoch, is_best=is_best)
    log(f"done; best eval accuracy {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
