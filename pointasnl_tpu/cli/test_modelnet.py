"""ModelNet40 voting evaluation — the TPU rebuild of test.py.

Same protocol (test.py:105-174): logit-sum voting over `num_votes` forward
passes, optional noisy-point sweep (1/10/50/100 injected random points,
:34,94-103), per-class accuracy table.

Fidelity note: the reference computes a shuffled index per vote but never
applies it (test.py:140-146), so its votes are identical passes. Here each
vote actually re-shuffles the point order — which re-seeds FPS and gives the
vote diversity the protocol intends.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

NOISE_POINTS = [1, 10, 50, 100]


def parse_args(argv=None):
    p = argparse.ArgumentParser("test_modelnet")
    p.add_argument("--data", default="data/modelnet40_normal_resampled")
    p.add_argument("--log_dir", default="logs/modelnet_cls", help="checkpoint dir")
    p.add_argument(
        "--ckpt", default="best",
        help="checkpoint to restore: best, latest, or an epoch number",
    )
    p.add_argument("--model", default="pointasnl_cls")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--num_votes", type=int, default=5)
    p.add_argument("--AS", action="store_true")
    p.add_argument("--normal", action="store_true")
    p.add_argument("--noise", action="store_true", help="noisy-point robustness sweep")
    p.add_argument("--num_classes", type=int, default=40)
    p.add_argument(
        "--precision", default="float32",
        choices=["float32", "bfloat16"],
        help="compute dtype for the jitted model (bf16 = the MXU "
        "throughput path; see tests/test_precision.py for the "
        "numerics gate and VALIDATION.md for the recipe-level gate)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dp", action="store_true",
        help="batch-shard the voting forwards over all local devices "
        "(SPMD inference; requires batch_size divisible by device count "
        "for the sharded fast path)",
    )
    p.add_argument(
        "--profile", action="store_true",
        help="trace the first voting forwards into <log_dir>/profile "
        "(view with Perfetto/TensorBoard)",
    )
    return p.parse_args(argv)


def evaluate_once(state, predict, dataset, flags, rs, num_noisy_points=0,
                  log=print, place=None, tracer=None):
    import jax.numpy as jnp

    from pointasnl_tpu.data import provider

    if place is None:
        place = jnp.asarray

    total_correct = total_seen = 0
    class_seen = np.zeros(flags.num_classes)
    class_correct = np.zeros(flags.num_classes)
    while dataset.has_next_batch():
        batch_data, batch_label = dataset.next_batch()
        bsize = batch_data.shape[0]
        if num_noisy_points > 0:
            noisy = rs.random_sample((bsize, num_noisy_points, 3))
            noisy = provider.normalize_data(noisy)
            batch_data[:, :num_noisy_points, :3] = noisy
        if bsize < flags.batch_size:
            pad = flags.batch_size - bsize
            batch_data = np.concatenate([batch_data, np.repeat(batch_data[:1], pad, 0)], 0)
            batch_label = np.concatenate([batch_label, np.repeat(batch_label[:1], pad, 0)], 0)
        pred_sum = np.zeros((flags.batch_size, flags.num_classes))
        for _ in range(flags.num_votes):
            shuffled = np.arange(flags.num_point)
            rs.shuffle(shuffled)
            if tracer is not None:
                tracer.before()
            logits = predict(state, place(batch_data[:, shuffled, :], jnp.float32))
            if tracer is not None:
                tracer.after(logits)
            pred_sum += np.asarray(logits)
        preds = np.argmax(pred_sum, 1)[:bsize]
        labels = batch_label[:bsize]
        total_correct += int(np.sum(preds == labels))
        total_seen += bsize
        for i in range(bsize):
            class_seen[labels[i]] += 1
            class_correct[labels[i]] += int(preds[i] == labels[i])
    dataset.reset()
    acc = total_correct / max(total_seen, 1)
    log(f"Eval accuracy: {acc:.4f}")
    log(
        "Eval avg class acc: "
        f"{float(np.mean(class_correct / np.maximum(class_seen, 1))):.4f}"
    )
    return acc, class_correct / np.maximum(class_seen, 1)


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
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import restore_checkpoint
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.train.steps import make_predict_step
    from pointasnl_tpu.utils import Logger

    log = Logger(flags.log_dir, filename="log_eval.txt")
    rs = np.random.RandomState(flags.seed)

    dataset = ModelNetDataset(
        flags.data,
        batch_size=flags.batch_size,
        npoints=flags.num_point,
        split="test",
        normal_channel=flags.normal,
        random_state=rs,
    )

    model_cls = get_model_class(flags.model)
    model = model_cls(
        num_class=flags.num_classes, use_normal=flags.normal, adaptive_sample=flags.AS
    )
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, flags.batch_size, 2e5, 0.7))
    example = jnp.zeros((flags.batch_size, flags.num_point, dataset.num_channel()), jnp.float32)
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(0))
    state = restore_checkpoint(state, flags.log_dir, flags.ckpt)
    place = None
    if flags.dp:
        from pointasnl_tpu.parallel.mesh import setup_data_parallel_eval

        state, place = setup_data_parallel_eval(state, log)
    predict = make_predict_step()

    from pointasnl_tpu.train.profiling import StepTraceWindow

    tracer = StepTraceWindow(
        os.path.join(flags.log_dir, "profile"), enabled=flags.profile, log=log
    )
    log("*** Evaluation ***")
    try:
        acc, class_accs = evaluate_once(
            state, predict, dataset, flags, rs, log=log, place=place, tracer=tracer
        )
    finally:
        tracer.close()
    for i, name in enumerate(dataset.cat):
        log(f"{name:>12s}:\t{class_accs[i]:.3f}")

    if flags.noise:
        lines = ["Noise    Accuracy", f" 000       {acc:.3f}"]
        sweep = {0: acc}
        for n in NOISE_POINTS:
            log(f"*** Evaluation with {n} Noisy Points ***")
            nacc, _ = evaluate_once(
                state, predict, dataset, flags, rs,
                num_noisy_points=n, log=log, place=place,
            )
            lines.append(f" {n:03d}       {nacc:.3f}")
            sweep[n] = nacc
        log("\n".join(lines))
        return sweep
    return acc


if __name__ == "__main__":
    main()
