"""ScanNet grid-sampled tester — rebuild of ScanNet/test_scannet_grid.py.

Protocol parity: reload the training args.txt to reconstruct the model
(test_scannet_grid.py:37-39), run potential-driven crops until every point's
potential exceeds `num_votes` (:271), EMA the per-cloud class probabilities
(0.95 val / 0.98 test, :101,234), then reproject the subcloud probs onto the
mesh vertices through the cached projection indices and report mIoU (val) or
dump NYU40-id txt submissions (test).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np

from pointasnl_tpu.cli.train_scannet_grid import vote_projection_eval
from pointasnl_tpu.cli.seg_common import nl_kwargs


def parse_args(argv=None):
    p = argparse.ArgumentParser("test_scannet_grid")
    p.add_argument("--data", default="data/Scannet")
    p.add_argument("--model_path", required=True, help="train log dir (args.txt + ckpts)")
    p.add_argument(
        "--ckpt", default="best",
        help="checkpoint to restore: best, latest, or an epoch number",
    )
    p.add_argument("--dump_dir", default="logs/scannet_grid_dump/")
    p.add_argument("--num_votes", type=float, default=10.0)
    p.add_argument("--split", default="validation", choices=["validation", "test"])
    p.add_argument("--batch_size", type=int, default=0, help="0 = train-time value")
    p.add_argument("--max_rounds", type=int, default=100, help="safety cap on vote rounds")
    p.add_argument(
        "--profile", action="store_true",
        help="trace the first inference steps into <dump_dir>/profile "
        "(the reference's TimeLiner role, test_scannet_grid.py:53-75)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dp", action="store_true",
        help="batch-shard the vote rounds over all local devices "
        "(SPMD inference; requires batch_size divisible by device count "
        "for the sharded fast path)",
    )
    return p.parse_args(argv)


def main(argv=None):
    flags = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.data.grid_pipeline import GridConfig
    from pointasnl_tpu.data.scannet_grid import ScannetGridDataset
    from pointasnl_tpu.models import get_model_class
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import restore_checkpoint
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.train.steps import make_predict_step
    from pointasnl_tpu.utils import Logger, load_args

    train_args = load_args(flags.model_path)
    dump_dir = os.path.join(flags.dump_dir, datetime.now().strftime("%Y_%m_%d_%H_%M_%S"))
    os.makedirs(dump_dir, exist_ok=True)
    log = Logger(dump_dir, filename="log_test.txt")
    rs = np.random.RandomState(flags.seed)

    num_point = train_args["num_point"]
    with_rgb = train_args.get("with_rgb", True)
    feature_channel = 3 if with_rgb else 0
    num_classes = 21
    batch_size = flags.batch_size or train_args["batch_size"]
    load_test = flags.split == "test"

    dataset = ScannetGridDataset(
        flags.data,
        npoint=num_point,
        buffer=train_args.get("num_buffer", 1024),
        load_test=load_test,
        random_state=rs,
    )
    dataset.load_subsampled_clouds(train_args.get("first_subsampling_dl", 0.04))

    cfg = GridConfig(
        batch_size=batch_size,
        validation_size=max(
            sum(t.data.shape[0] for t in dataset.input_trees[flags.split])
            // max(num_point * batch_size, 1),
            1,
        ),
        in_radius=train_args.get("in_radius", 0),
        input_threads=train_args.get("input_threads", 8),
    )

    model = get_model_class(train_args["model"])(
        num_class=num_classes, feature_channel=feature_channel,
        **nl_kwargs(train_args),
    )
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, batch_size, 2e5, 0.7))
    example = jnp.zeros((batch_size, num_point, 3 + feature_channel), jnp.float32)
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(0))
    state = restore_checkpoint(state, flags.model_path, flags.ckpt)
    place = jnp.asarray
    if flags.dp:
        from pointasnl_tpu.parallel.mesh import setup_data_parallel_eval

        state, place = setup_data_parallel_eval(state, log)
    predict = make_predict_step()
    log("Model restored.")

    test_smooth = 0.98 if load_test else 0.95
    cloud_probs = [
        np.zeros((t.data.shape[0], num_classes - 1)) for t in dataset.input_trees[flags.split]
    ]

    def model_input(batch):
        pts = batch["points"].astype(np.float32)
        if with_rgb:
            return np.concatenate([pts, batch["colors"].astype(np.float32)], axis=-1)
        return pts

    from pointasnl_tpu.train.profiling import StepTraceWindow

    tracer = StepTraceWindow(
        os.path.join(dump_dir, "profile"), enabled=flags.profile, log=log
    )
    round_idx = 0
    try:
        while round_idx < flags.max_rounds:
            for batch in dataset.batches(flags.split, cfg, augment=False):
                # the np.asarray fetch inside traced() syncs the device
                logits = np.asarray(
                    tracer.traced(lambda: predict(state, place(model_input(batch))))
                )
                probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[:, :, 1:]), axis=-1))
                for b in range(probs.shape[0]):
                    c_i = int(batch["cloud_ind"][b])
                    inds = batch["point_inds"][b]
                    cloud_probs[c_i][inds] = (
                        test_smooth * cloud_probs[c_i][inds] + (1 - test_smooth) * probs[b]
                    )
            min_pot = float(np.min(dataset.min_potentials[flags.split]))
            log(f"round {round_idx}: min potential {min_pot:.2f}")
            round_idx += 1
            if min_pot > flags.num_votes:
                break
    finally:
        tracer.close()  # fewer steps than the window, or an exception

    if flags.split == "validation":
        miou = vote_projection_eval(dataset, cloud_probs, num_classes, log)
        log(f"Final voting mIoU: {miou:.3f}")
        return miou

    # test split: reproject and dump NYU40-id txt submissions
    label_values = dataset.label_values
    ignored = set(dataset.ignored_labels.tolist())
    for i_test, file_path in enumerate(dataset.test_files):
        sub_probs = cloud_probs[i_test]
        for l_ind, label_value in enumerate(label_values):
            if label_value in ignored:
                sub_probs = np.insert(sub_probs, l_ind, 0, axis=1)
        sub_preds = label_values[np.argmax(sub_probs, axis=1).astype(np.int32)]
        preds = sub_preds[dataset.test_proj[i_test]].astype(np.int32)
        cloud_name = file_path.split("/")[-1][:-4]
        with open(os.path.join(dump_dir, cloud_name + ".txt"), "w") as f:
            for v in preds:
                f.write(f"{int(v)}\n")
        log(f"dumped {cloud_name} ({len(preds)} vertices)")
    log("Done!")
    return None


if __name__ == "__main__":
    main()
