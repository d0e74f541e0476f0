"""Scaled synthetic SemanticKITTI-pipeline validation (VERDICT r4 item 3).

tests/test_cli_grid.py proves the KITTI grid CLI path end to end on tiny
3k-point scans; this drives the SAME surface at realistic scan scale
(~120k points/scan, the raw SemanticKITTI scan size) the way
validate_seg_scale.py does for ScanNet:

  1. generate synthetic LiDAR-like scans with geometry-determined labels in
     RAW SemanticKITTI ids (road=40 on the ground plane, building=50 on
     walls, car=10 on boxes), written as velodyne/*.bin (x,y,z,remission
     f32) + labels/*.label (uint32) — seq 00 trains, seq 08 validates;
  2. train_semantic_kitti_grid (grid subsample -> potential crops -> DP/
     single-chip train loop, EMA validation) — the trajectory is parsed
     back from its own log_train.txt;
  3. test_semantic_kitti_grid (possibility-voted crops until every point's
     possibility exceeds num_votes, prob EMA 0.98, reprojection through the
     cached projection indices, learning_map_inv remap, uint32 .label dump
     — the reference protocol, SemanticKITTI/test_semantic_kitti_grid.py:
     120-180);
  4. score the dumped submission the way the official semantic-kitti-api
     evaluator does: re-read each .label, map through learning_map
     (raw id -> train id), and feed IouEval(ignore=[0]) against the ground
     truth — asserting the uint32 round trip (count == raw scan size, ids
     drawn from learning_map_inv's range) along the way.

Prints a per-epoch trajectory + a final JSON line for VALIDATION.md.

Usage: python scripts/validate_kitti_scale.py [--train_scans 48]
       [--val_scans 4] [--points 120000] [--epochs 30] [--out /tmp/kitti_scale]
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

from pointasnl_tpu.data.semantic_kitti_config import default_config
from pointasnl_tpu.data.synthetic import labeled_surface_scene

# scene-generator class -> raw SemanticKITTI id (labeled_surface_scene
# emits ScanNet-convention floor=2 / wall=1 / box=3)
_RAW_ID = {2: 40, 1: 50, 3: 10}  # road, building, car


def generate_scans(root: str, seq: str, n_scans: int, n_points: int,
                   extent: float, rng: np.random.RandomState) -> None:
    vel = os.path.join(root, seq, "velodyne")
    lab = os.path.join(root, seq, "labels")
    os.makedirs(vel, exist_ok=True)
    os.makedirs(lab, exist_ok=True)
    for i in range(n_scans):
        t0 = time.time()
        xyz, labels = labeled_surface_scene(rng, n=n_points, extent=extent)
        # LiDAR frames are sensor-centered; the generator is corner-origin
        xyz = xyz - np.array([extent / 2, extent / 2, 0], np.float32)
        scan = np.zeros((n_points, 4), np.float32)
        scan[:, :3] = xyz
        scan[:, 3] = rng.rand(n_points)  # remission
        raw = np.vectorize(_RAW_ID.get)(labels).astype(np.uint32)
        scan.tofile(os.path.join(vel, f"{i:06d}.bin"))
        raw.tofile(os.path.join(lab, f"{i:06d}.label"))
        print(f"# generated {seq}/{i:06d}: {n_points} pts "
              f"({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)


def parse_trajectory(log_dir: str):
    """(epoch, train_s, point_miou, vote_miou) rows from log_train.txt."""
    path = os.path.join(log_dir, "log_train.txt")
    rows, epoch, train_s, point_iou, vote_iou = [], None, None, None, None
    if not os.path.exists(path):
        return rows
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


def score_submission(data_root: str, pred_root: str, seq: str):
    """Official-evaluator-equivalent scoring of the dumped .label files.

    Returns (miou, per_class_iou dict, n_scans). Asserts the uint32 label
    round trip: every prediction file re-reads to the raw scan's point
    count with ids inside learning_map_inv's range.
    """
    from pointasnl_tpu.train.metrics import IouEval

    cfg = default_config()
    learning_map = cfg["learning_map"]
    inv_range = set(cfg["learning_map_inv"].values())
    max_raw = max(learning_map) + 1
    lut = np.zeros(max_raw, np.int32)
    for raw_id, train_id in learning_map.items():
        lut[raw_id] = train_id

    n_classes = 1 + max(learning_map.values())
    ev = IouEval(n_classes, ignore=[0])
    gt_present = set()
    pred_files = sorted(glob.glob(
        os.path.join(pred_root, "sequences", seq, "predictions", "*.label")))
    assert pred_files, f"no predictions under {pred_root}"
    for pf in pred_files:
        frame = os.path.splitext(os.path.basename(pf))[0]
        gt_path = os.path.join(data_root, seq, "labels", frame + ".label")
        scan_path = os.path.join(data_root, seq, "velodyne", frame + ".bin")
        n_raw = os.path.getsize(scan_path) // (4 * 4)
        pred_raw = np.fromfile(pf, dtype=np.uint32)
        # the uint32 round trip the official evaluator depends on
        assert pred_raw.shape[0] == n_raw, (
            f"{pf}: {pred_raw.shape[0]} labels vs {n_raw} scan points")
        sem_pred = pred_raw & 0xFFFF  # lower half = semantic id
        assert set(np.unique(sem_pred)).issubset(inv_range), (
            f"{pf}: ids outside learning_map_inv range")
        gt_raw = np.fromfile(gt_path, dtype=np.uint32) & 0xFFFF
        gt_train = lut[gt_raw]
        gt_present.update(int(c) for c in np.unique(gt_train) if c != 0)
        ev.addBatch(lut[sem_pred], gt_train)
    # The official evaluator averages over all 19 classes; a 3-class
    # synthetic world would cap that at 3/19 even for a perfect
    # submission, so the validation metric averages over GT-PRESENT
    # classes (the full-19 number is also returned for reference).
    miou_all, per_class = ev.getIoU()
    present = sorted(gt_present)
    miou = float(np.mean([per_class[c] for c in present]))
    return miou, float(miou_all), per_class, len(pred_files)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_scans", type=int, default=48)
    ap.add_argument("--val_scans", type=int, default=4)
    ap.add_argument("--points", type=int, default=120_000)
    ap.add_argument("--extent", type=float, default=18.0)
    ap.add_argument("--epochs", type=int, default=30)
    # NOTE: the KITTI grid generator sizes a training epoch at
    # (n_scans // batch) * batch possibility-crops (reference
    # semantics, data/semantic_kitti_grid.py:244) — steps_per_epoch
    # only CAPS it, so scan count x epochs sets the step budget:
    # 48 scans -> 12 steps/epoch, x30 epochs = 360 steps.
    ap.add_argument("--steps_per_epoch", type=int, default=1000)
    ap.add_argument("--num_point", type=int, default=8192)
    ap.add_argument("--first_subsampling_dl", type=float, default=0.06)
    ap.add_argument("--num_votes", type=float, default=1.5)
    ap.add_argument("--max_rounds", type=int, default=30)
    ap.add_argument("--out", default="/tmp/kitti_scale")
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--keep", action="store_true", help="keep raw scans")
    args = ap.parse_args()

    data_root = os.path.join(args.out, "sequences")
    log_dir = os.path.join(args.out, "logs")
    pred_dir = os.path.join(args.out, "pred")
    for d in (log_dir, pred_dir):
        shutil.rmtree(d, ignore_errors=True)

    if not os.path.isdir(os.path.join(data_root, "08")):
        t0 = time.time()
        rng = np.random.RandomState(args.seed)
        generate_scans(data_root, "00", args.train_scans, args.points,
                       args.extent, rng)
        generate_scans(data_root, "08", args.val_scans, args.points,
                       args.extent, rng)
        print(f"# scan generation: {time.time()-t0:.1f}s", file=sys.stderr)

    from pointasnl_tpu.cli import test_semantic_kitti_grid, train_semantic_kitti_grid

    t0 = time.time()
    best_iou = train_semantic_kitti_grid.main([
        "--data", data_root,
        "--log_dir", log_dir,
        "--model", "pointasnl_sem_seg_res",
        "--batch_size", "4",
        "--num_point", str(args.num_point),
        "--first_subsampling_dl", str(args.first_subsampling_dl),
        "--prepare_data",
        "--max_epoch", str(args.epochs),
        "--steps_per_epoch", str(args.steps_per_epoch),
        "--eval_steps", "15",
        "--learning_rate", "0.002",
    ])
    train_wall = time.time() - t0

    t0 = time.time()
    test_semantic_kitti_grid.main([
        "--data", data_root,
        "--model_path", log_dir,
        "--ckpt", "best",
        "--save_dir", pred_dir,
        "--test_id", "8",
        "--num_votes", str(args.num_votes),
        "--max_rounds", str(args.max_rounds),
    ])
    test_wall = time.time() - t0

    miou, miou_all19, per_class, n_scans = score_submission(
        data_root, pred_dir, "08")

    rows = parse_trajectory(log_dir)
    print(f"\n## kitti-scale validation: {args.train_scans}+{args.val_scans} "
          f"scans x {args.points} pts (extent {args.extent}, "
          f"crop {args.num_point}, dl {args.first_subsampling_dl})")
    print(f"{'epoch':>5} {'train_s':>8} {'point mIoU':>11} {'vote mIoU':>10}")
    for e, ts, pi, vi in rows:
        print(f"{e:5d} {ts if ts else 0:8.1f} "
              f"{pi if pi is not None else float('nan'):11.3f} "
              f"{'' if vi is None else f'{vi:10.3f}'}")
    print(json.dumps({
        "best_train_iou": best_iou,
        "submission_voted_miou_present_classes": round(miou, 4),
        "submission_voted_miou_all19": round(miou_all19, 4),
        "scored_scans": n_scans,
        "train_wall_s": round(train_wall, 1),
        "test_wall_s": round(test_wall, 1),
        "trajectory": rows,
    }))
    if not args.keep:
        shutil.rmtree(data_root, ignore_errors=True)
        shutil.rmtree(data_root.rstrip("/") + f"_{args.first_subsampling_dl}",
                      ignore_errors=True)


if __name__ == "__main__":
    main()
