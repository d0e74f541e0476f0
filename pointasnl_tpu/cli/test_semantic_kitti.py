"""SemanticKITTI sliding-window inference — rebuild of
SemanticKITTI/test_semantic_kitti.py.

Protocol parity: per scan, `num_votes` sliding-window passes, per-block
argmax over classes 1: (+1), vote pooling into original point ids, uint32
`.label` dump under sequences/{seq}/predictions (test_semantic_kitti.py:135-180).

`--remap_inv` additionally maps training ids through learning_map_inv to raw
label ids — what the official semantic-kitti-api evaluator expects (the
reference block tester writes raw training ids and relies on the api's remap
script; the grid tester remaps, so both conventions are available here).

`--single_pass` skips the chopping entirely and feeds the WHOLE LiDAR scan
(~120k points) through the model at once — memory-bounded NL attention
(`--nl_block_size`) + the spatially-pruned kNN make this TPU-native path
possible where the reference's dense attention map could not exist.
`--single_pass --sharded` additionally shards the POINT axis over every
local device (parallel/whole_scene.predict_scan_sharded: ring non-local
attention, sharded kNN/FPS) for scans beyond one chip's memory.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pointasnl_tpu.cli.seg_common import (
    SegEvalAccumulator,
    add_nl_args,
    add_vote,
    nl_kwargs,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("test_semantic_kitti")
    p.add_argument("--data", default="data/kitti/dataset/")
    p.add_argument("--model", default="pointasnl_sem_seg")
    p.add_argument("--model_path", required=True, help="checkpoint dir")
    p.add_argument(
        "--ckpt", default="best",
        help="checkpoint to restore: best, latest, or an epoch number",
    )
    p.add_argument("--dump_dir", default="logs/kitti_dump/")
    p.add_argument("--save_dir", default="logs/kitti_pred/")
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--num_point", type=int, default=8192)
    p.add_argument("--num_votes", type=int, default=1)
    p.add_argument("--with_remission", action="store_true")
    p.add_argument("--random_rotate", action="store_true")
    p.add_argument("--config_file", default=None)
    p.add_argument("--dataset", default="valid", choices=["valid", "test"])
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--remap_inv", action="store_true", help="write raw label ids")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_scans", type=int, default=0, help="0 = all")
    p.add_argument(
        "--profile", action="store_true",
        help="trace the first inference dispatches into <dump_dir>/profile "
        "(view with Perfetto/TensorBoard)",
    )
    add_nl_args(p)
    p.add_argument(
        "--single_pass", action="store_true",
        help="whole-scan single-pass inference: the ENTIRE LiDAR scan goes "
        "through the model at once (memory-bounded attention/kNN) instead "
        "of the reference's strided block chopping. Pair with "
        "--nl_block_size for scan-scale attention memory.",
    )
    p.add_argument(
        "--pad_quantum", type=int, default=8192,
        help="single-pass scans are dup-padded up to a multiple of this "
        "(bounds jit recompiles across scan sizes; must be divisible by 256)",
    )
    p.add_argument(
        "--dp", action="store_true",
        help="batch-shard the sliding-window forwards over all local "
        "devices (SPMD inference; requires batch_size divisible by device "
        "count for the sharded fast path)",
    )
    p.add_argument(
        "--sharded", action="store_true",
        help="single-pass inference with the POINT axis sharded over all "
        "local devices (parallel/whole_scene.py ring-attention path; "
        "requires --single_pass). Mutually exclusive with --dp, which "
        "shards the BATCH axis instead.",
    )
    return p.parse_args(argv)


def main(argv=None):
    flags = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.data import provider
    from pointasnl_tpu.data.semantic_kitti import SemanticKittiDatasetSlidingWindow
    from pointasnl_tpu.data.semantic_kitti_config import LEARNING_MAP_INV
    from pointasnl_tpu.models import get_model_class
    from pointasnl_tpu.train import create_train_state, staircase_lr_schedule
    from pointasnl_tpu.train.checkpoint import restore_checkpoint
    from pointasnl_tpu.train.state import make_optimizer
    from pointasnl_tpu.train.steps import make_predict_step
    from pointasnl_tpu.utils import Logger

    os.makedirs(flags.dump_dir, exist_ok=True)
    log = Logger(flags.dump_dir, filename="log_evaluate.txt")
    rs = np.random.RandomState(flags.seed)
    feature_channel = 1 if flags.with_remission else 0

    dataset = SemanticKittiDatasetSlidingWindow(
        flags.data,
        sample_points=flags.num_point,
        split=flags.dataset,
        with_remission=flags.with_remission,
        config_file=flags.config_file,
        random_state=rs,
    )

    model = get_model_class(flags.model)(
        num_class=flags.num_classes, feature_channel=feature_channel,
        **nl_kwargs(flags),
    )
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, flags.batch_size, 2e5, 0.7))
    example = jnp.zeros((flags.batch_size, flags.num_point, 3 + feature_channel), jnp.float32)
    state = create_train_state(model, example, tx=tx, rng=jax.random.PRNGKey(0))
    state = restore_checkpoint(state, flags.model_path, flags.ckpt)
    place = jnp.asarray
    if flags.dp:
        if flags.sharded:
            raise ValueError(
                "--dp (batch-sharded) and --sharded (point-sharded) are "
                "mutually exclusive"
            )
        from pointasnl_tpu.parallel.mesh import setup_data_parallel_eval

        state, place = setup_data_parallel_eval(state, log)

    mesh_divisor = 256
    if flags.sharded:
        if not flags.single_pass:
            raise ValueError("--sharded requires --single_pass")
        if flags.model != "pointasnl_sem_seg":
            raise ValueError(
                "--sharded supports --model pointasnl_sem_seg only "
                "(parallel/whole_scene.py orchestrates that architecture)"
            )
        from pointasnl_tpu.parallel import make_mesh, replicate
        from pointasnl_tpu.parallel.whole_scene import predict_scan_sharded

        mesh = make_mesh()
        mesh_divisor = 256 * mesh.devices.size
        # the restored state lives on one device; the shard_map needs the
        # variables addressable on every mesh device
        variables = replicate(
            {"params": state.params, "batch_stats": state.batch_stats}, mesh
        )
        nl_blk = nl_kwargs(flags)["nl_kv_block_size"]

        @jax.jit
        def predict_sharded(variables, pts):
            return predict_scan_sharded(
                variables, pts, mesh,
                num_class=flags.num_classes,
                feature_channel=feature_channel,
                nl_kv_block_size=nl_blk,
            )

        log(f"sharded single-pass over {mesh.devices.size} devices")
    predict = make_predict_step()
    log("Model restored.")

    inv_lut = np.zeros(flags.num_classes, np.uint32)
    for k, v in LEARNING_MAP_INV.items():
        inv_lut[k] = v

    from pointasnl_tpu.train.profiling import StepTraceWindow

    tracer = StepTraceWindow(
        os.path.join(flags.dump_dir, "profile"), enabled=flags.profile, log=log
    )
    total = SegEvalAccumulator(flags.num_classes)
    n_scans = len(dataset) if flags.max_scans == 0 else min(flags.max_scans, len(dataset))
    try:
        for scan_idx in range(n_scans):
            full_points_name = dataset.points_name[scan_idx]
            components = full_points_name.split(os.sep)
            sequence = components[-3]
            label_name = components[-1].replace("bin", "label")
            save_dir = os.path.join(flags.save_dir, "sequences", sequence, "predictions")
            os.makedirs(save_dir, exist_ok=True)

            whole_scene_label = None
            vote_label_pool = None
            if flags.single_pass:
                # Whole scan through the model at once, per vote: fresh point
                # order each vote re-seeds FPS (the voting randomness), as in
                # the reference protocol; dup-padding to a quantum bounds jit
                # recompiles across scan sizes (mirrors test_scannet).
                pts_full, whole_scene_label = dataset.whole_scan(scan_idx)
                n = pts_full.shape[0]
                vote_label_pool = np.zeros((n, flags.num_classes))
                quantum = max(
                    mesh_divisor, flags.pad_quantum - flags.pad_quantum % mesh_divisor
                )
                for _ in range(flags.num_votes):
                    pidx = np.arange(n)
                    pts = pts_full
                    n_pad = (-n) % quantum
                    if n_pad:
                        dup = rs.choice(n, n_pad)
                        pts = np.concatenate([pts, pts[dup]], axis=0)
                        pidx = np.concatenate([pidx, dup], axis=0)
                    order = rs.permutation(pts.shape[0])
                    pts, pidx = pts[order].copy(), pidx[order]
                    if flags.random_rotate:
                        pts[:, :3] = provider.rotate_point_cloud_z(
                            pts[None, :, :3], random_state=rs
                        )[0]
                    scene_in = jnp.asarray(pts[None, :, : 3 + feature_channel])
                    if flags.sharded:
                        logits = np.asarray(
                            tracer.traced(lambda: predict_sharded(variables, scene_in))
                        )[0]
                    else:
                        logits = np.asarray(tracer.traced(lambda: predict(state, scene_in)))[0]
                    pred_label = np.argmax(logits[:, 1:], 1) + 1
                    vote_label_pool = add_vote(
                        vote_label_pool, pidx[None], pred_label[None],
                        np.ones((1, len(pidx))),
                    )
                num_votes_done = flags.num_votes
            else:
                num_votes_done = 0
            for _ in range(flags.num_votes - num_votes_done):
                item = dataset[scan_idx]
                if flags.dataset == "test":
                    scene_data, scene_point_index, whole_scene_data = item
                else:
                    scene_data, scene_point_index, whole_scene_data, whole_scene_label = item
                if vote_label_pool is None:
                    vote_label_pool = np.zeros((whole_scene_data.shape[0], flags.num_classes))
                num_blocks = scene_data.shape[0]
                s_batch_num = (num_blocks + flags.batch_size - 1) // flags.batch_size
                for sbatch in range(s_batch_num):
                    start = sbatch * flags.batch_size
                    end = min((sbatch + 1) * flags.batch_size, num_blocks)
                    real = end - start
                    batch_data = np.zeros(
                        (flags.batch_size, flags.num_point, 3 + feature_channel), np.float32
                    )
                    batch_index = np.zeros((flags.batch_size, flags.num_point))
                    batch_data[:real] = scene_data[start:end]
                    batch_index[:real] = scene_point_index[start:end]
                    if flags.random_rotate:
                        batch_data[:, :, :3] = provider.rotate_point_cloud_z(
                            batch_data[:, :, :3], random_state=rs
                        )
                    logits = np.asarray(
                        tracer.traced(lambda: predict(state, place(batch_data)))
                    )
                    pred_label = np.argmax(logits[:, :, 1:], 2) + 1
                    vote_label_pool = add_vote(
                        vote_label_pool,
                        batch_index[:real],
                        pred_label[:real],
                        np.ones_like(batch_index[:real]),
                    )

            final_preds = np.argmax(vote_label_pool, axis=1).astype(np.uint32)
            out = inv_lut[final_preds] if flags.remap_inv else final_preds
            out.astype(np.uint32).tofile(os.path.join(save_dir, label_name))

            if flags.dataset != "test" and whole_scene_label is not None:
                scan_acc = SegEvalAccumulator(flags.num_classes)
                scan_acc.update(final_preds, whole_scene_label)
                total.update(final_preds, whole_scene_label)
                log(
                    f"[{scan_idx + 1}/{n_scans}] {sequence}-{label_name.split('.')[0]} "
                    f"mIoU {scan_acc.miou():.4f}"
                )

    finally:
        # fewer total dispatches than the window's steps (e.g. --single_pass
        # --num_votes 1 --max_scans 1), or an exception between traced()
        # calls, must still end the trace: jax.profiler crashes on process
        # exit with an open trace and the artifact would be lost.
        tracer.close()

    if flags.dataset != "test":
        log(f"eval point avg class IoU: {total.miou():.6f}")
        log(f"eval point accuracy: {total.accuracy():.6f}")
        return total.miou()
    log("Done!")
    return None


if __name__ == "__main__":
    main()
