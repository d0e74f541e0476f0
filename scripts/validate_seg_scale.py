"""Scaled synthetic seg-pipeline validation (VERDICT r3 item 4).

The recipe e2e (tests/test_recipe_seg_e2e.py) proves the grid pipeline
learns, but on tiny scenes (8 x 6k points). This drives the SAME CLI
surface — prepare -> train_scannet_grid (potential crops, EMA validation,
vote-projection eval) -> test_scannet_grid (potential-voted projection to
mesh vertices) — at realistic scene scale: ~100k-point synthetic surface
scenes x >= 20 scenes, the closest in-env proxy for the reference's ScanNet
contract (/root/reference/README.md:64, 66.6% mIoU) in a zero-egress build.

Prints a per-epoch mIoU / wall-time trajectory (parsed back from the
trainer's own log_train.txt) for VALIDATION.md.

Usage: python scripts/validate_seg_scale.py [--scenes 24] [--points 100000]
       [--epochs 10] [--out /tmp/seg_scale]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pointasnl_tpu.data.ply import write_ply
from pointasnl_tpu.data.synthetic import labeled_surface_scene


def generate_scenes(root: str, n_scenes: int, n_points: int, n_val: int,
                    extent: float, seed: int) -> None:
    rng = np.random.RandomState(seed)
    tp = os.path.join(root, "training_points")
    tm = os.path.join(root, "training_meshes")
    os.makedirs(tp, exist_ok=True)
    os.makedirs(tm, exist_ok=True)
    scenes = [f"scene{i:04d}_00" for i in range(n_scenes)]
    for scene in scenes:
        t0 = time.time()
        xyz, labels = labeled_surface_scene(rng, n=n_points, extent=extent)
        # colors weakly correlated with height only (labels must be learned
        # from geometry, as in the tiny-scene e2e)
        rgb = (rng.rand(len(xyz), 3) * 255).astype(np.uint8)
        vert_inds = np.arange(len(xyz), dtype=np.int32)
        write_ply(
            os.path.join(tp, f"{scene}.ply"),
            [xyz, rgb, labels, vert_inds],
            ["x", "y", "z", "red", "green", "blue", "class", "vert_ind"],
        )
        faces = rng.randint(0, len(xyz), (600, 3)).astype(np.int32)
        write_ply(
            os.path.join(tm, f"{scene}_mesh.ply"),
            [xyz, rgb, labels],
            ["x", "y", "z", "red", "green", "blue", "class"],
            triangular_faces=faces,
        )
        print(f"# generated {scene}: {n_points} pts ({time.time()-t0:.1f}s)",
              file=sys.stderr, flush=True)
    val = scenes[-n_val:]
    with open(os.path.join(root, "scannet_v2_val.txt"), "w") as f:
        f.write("\n".join(val) + "\n")


def parse_trajectory(log_dir: str):
    """Pull (epoch, train_s, point_miou, vote_miou) rows from log_train.txt."""
    path = os.path.join(log_dir, "log_train.txt")
    rows, epoch, train_s, point_iou = [], None, None, None
    for line in open(path):
        m = re.search(r"\*\*\*\* EPOCH (\d+) \*\*\*\*", line)
        if m:
            if epoch is not None:
                rows.append((epoch, train_s, point_iou, vote_iou))
            epoch, train_s, point_iou, vote_iou = int(m.group(1)), None, None, None
        m = re.search(r"train loss [\d.]+ \(([\d.]+)s", line)
        if m:
            train_s = float(m.group(1))
        m = re.search(r"Eval point avg class IoU: ([\d.]+)", line)
        if m:
            point_iou = float(m.group(1))
        m = re.search(r"Eval voting avg class IoU: ([\d.]+)", line)
        if m:
            vote_iou = float(m.group(1))
    if epoch is not None:
        rows.append((epoch, train_s, point_iou, vote_iou))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--val_scenes", type=int, default=4)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--extent", type=float, default=6.0)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--epoch_sample", type=int, default=480)
    ap.add_argument("--num_point", type=int, default=8192)
    ap.add_argument("--out", default="/tmp/seg_scale")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--keep", action="store_true", help="keep scene plys")
    args = ap.parse_args()

    data_root = os.path.join(args.out, "scenes")
    log_dir = os.path.join(args.out, "logs")
    dump_dir = os.path.join(args.out, "dump")
    for d in (log_dir, dump_dir):
        shutil.rmtree(d, ignore_errors=True)

    if not os.path.exists(os.path.join(data_root, "scannet_v2_val.txt")):
        t0 = time.time()
        generate_scenes(data_root, args.scenes, args.points, args.val_scenes,
                        args.extent, args.seed)
        print(f"# scene generation: {time.time()-t0:.1f}s", file=sys.stderr)

    from pointasnl_tpu.cli import test_scannet_grid, train_scannet_grid

    t0 = time.time()
    best_vote_iou = train_scannet_grid.main([
        "--data", data_root,
        "--log_dir", log_dir,
        "--model", "pointasnl_sem_seg_res",
        "--batch_size", "4",
        "--num_point", str(args.num_point),
        "--epoch_sample", str(args.epoch_sample),
        "--validation_size", "60",
        "--max_epoch", str(args.epochs),
        "--snapshot_gap", "2",
        "--learning_rate", "0.002",
        "--max_to_keep", "3",
    ])
    train_wall = time.time() - t0

    t0 = time.time()
    test_miou = test_scannet_grid.main([
        "--data", data_root,
        "--model_path", log_dir,
        "--ckpt", "best",
        "--dump_dir", dump_dir,
        "--num_votes", "1.5",
        "--max_rounds", "30",
    ])
    test_wall = time.time() - t0

    rows = parse_trajectory(log_dir)
    print(f"\n## seg-scale validation: {args.scenes} scenes x {args.points} pts "
          f"(extent {args.extent}, crop {args.num_point}, "
          f"{args.epoch_sample // 4} steps/epoch)")
    print(f"{'epoch':>5} {'train_s':>8} {'point mIoU':>11} {'vote mIoU':>10}")
    for e, ts, pi, vi in rows:
        print(f"{e:5d} {ts if ts else 0:8.1f} "
              f"{pi if pi is not None else float('nan'):11.3f} "
              f"{'' if vi is None else f'{vi:10.3f}'}")
    print(json.dumps({
        "best_vote_iou": best_vote_iou,
        "test_voted_miou": test_miou,
        "train_wall_s": round(train_wall, 1),
        "test_wall_s": round(test_wall, 1),
        "trajectory": rows,
    }))
    if not args.keep:
        shutil.rmtree(data_root, ignore_errors=True)


if __name__ == "__main__":
    main()
