"""--dp end-to-end: every trainer AND tester CLI runs data-parallel on the
8-device mesh.

VERDICT r2 item 1: the DP machinery was step-level tested (test_parallel.py)
but the flag's glue — mesh build, state replication, `place_batch` feeding,
checkpointing of replicated state — was unexercised from the CLIs. These run
each of the five trainers' main() with --dp and batch_size=8 (divisible by
the 8 virtual CPU devices, tests/conftest.py) in debug mode, then drive the
matching tester with --dp against the trained log dir (batch-sharded SPMD
vote/eval forwards via parallel/mesh.py:setup_data_parallel_eval).

Reference anchor: the reference has no DP at all (SURVEY.md §2.9); this is
the repo's own TPU-native contract.
"""

import os
import pickle

import numpy as np
import pytest

from pointasnl_tpu.data.ply import write_ply
from tests.test_cli_grid import make_scene_cloud
from tests.test_cli_scannet import make_scene


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("modelnet_dp")
    names = ["airplane", "bed"]
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    train_ids, test_ids = [], []
    for name in names:
        (root / name).mkdir()
        for i in range(6):
            sid = f"{name}_{i:04d}"
            pts = rng.randn(300, 6).astype(np.float32)
            np.savetxt(root / name / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i < 4 else test_ids).append(sid)
    (root / "modelnet40_train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(test_ids) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("scannet_dp")
    for split, n_scenes in [("train", 8), ("val", 8)]:
        scene_data, scene_labels, scene_ids, scene_nums = [], [], [], []
        for _ in range(n_scenes):
            pts, labels = make_scene(rng, n=1500)
            scene_data.append(pts)
            scene_labels.append(labels)
            scene_ids.append(np.arange(len(pts)))
            scene_nums.append(len(pts))
        with open(root / f"scannet_{split}_rgb21c_pointid.pickle", "wb") as f:
            pickle.dump(scene_data, f)
            pickle.dump(scene_labels, f)
            pickle.dump(scene_ids, f)
            pickle.dump(scene_nums, f)
    (root / "scannetv2_val.txt").write_text(
        "\n".join(f"scene{i:04d}_00" for i in range(8)) + "\n"
    )
    return str(root)


def test_train_modelnet_dp(modelnet_root, tmp_path):
    from pointasnl_tpu.cli import train_modelnet

    log_dir = str(tmp_path / "logs")
    best_acc = train_modelnet.main(
        [
            "--data", modelnet_root,
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "128",
            "--debug",
            "--dp",
        ]
    )
    assert 0.0 <= best_acc <= 1.0
    # replicated state checkpoints cleanly
    assert os.path.isdir(os.path.join(log_dir, "latest"))

    # eval-side DP: batch-sharded voting forwards over the same mesh
    from pointasnl_tpu.cli import test_modelnet

    acc = test_modelnet.main(
        [
            "--data", modelnet_root,
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "128",
            "--num_votes", "1",
            "--dp",
        ]
    )
    assert 0.0 <= acc <= 1.0


def test_train_scannet_dp(scannet_root, tmp_path):
    from pointasnl_tpu.cli import train_scannet

    log_dir = str(tmp_path / "logs")
    best_iou = train_scannet.main(
        [
            "--data", scannet_root,
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "512",
            "--whole_eval_start", "0",
            "--debug",
            "--dp",
        ]
    )
    assert 0.0 <= best_iou <= 1.0
    assert os.path.isdir(os.path.join(log_dir, "latest"))

    # eval-side DP on the chopped sliding-window path (batch-sharded; the
    # zero-padded fixed-size batches always take the sharded fast path)
    from pointasnl_tpu.cli import test_scannet

    miou = test_scannet.main(
        [
            "--data", scannet_root,
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--dump_dir", str(tmp_path / "dump"),
            "--batch_size", "8",
            "--num_point", "512",
            "--num_votes", "1",
            "--max_scenes", "1",
            "--dp",
        ]
    )
    assert 0.0 <= miou <= 1.0


def test_train_semantic_kitti_dp(tmp_path_factory, tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path_factory.mktemp("kitti_dp")
    for seq in ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10", "08"]:
        vel = root / "sequences" / seq / "velodyne"
        lab = root / "sequences" / seq / "labels"
        vel.mkdir(parents=True)
        lab.mkdir(parents=True)
        n_scans = 8 if seq in ("00", "08") else 0
        for i in range(n_scans):
            n = 2000
            pts = np.zeros((n, 4), np.float32)
            pts[:, :3] = (rng.rand(n, 3) - 0.5) * 15
            pts[:, 3] = rng.rand(n)
            raw_ids = np.asarray([0, 10, 40, 48, 50, 70], np.uint32)
            sem = raw_ids[rng.randint(0, len(raw_ids), n)]
            pts.tofile(vel / f"{i:06d}.bin")
            sem.astype(np.uint32).tofile(lab / f"{i:06d}.label")

    from pointasnl_tpu.cli import train_semantic_kitti

    log_dir = str(tmp_path / "logs")
    best_iou = train_semantic_kitti.main(
        [
            "--data", str(root),
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "512",
            "--debug",
            "--dp",
        ]
    )
    assert 0.0 <= best_iou <= 1.0

    # eval-side DP on the KITTI sliding-window tester
    from pointasnl_tpu.cli import test_semantic_kitti

    miou = test_semantic_kitti.main(
        [
            "--data", str(root),
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--dump_dir", str(tmp_path / "dump"),
            "--save_dir", str(tmp_path / "pred"),
            "--batch_size", "8",
            "--num_point", "512",
            "--num_votes", "1",
            "--max_scans", "1",
            "--dp",
        ]
    )
    assert 0.0 <= miou <= 1.0


def test_train_scannet_grid_dp(tmp_path_factory, tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("scannet_grid_dp")
    tp = root / "training_points"
    tm = root / "training_meshes"
    tp.mkdir()
    tm.mkdir()
    scenes = [f"scene{i:04d}_00" for i in range(3)]
    for scene in scenes:
        xyz, rgb, labels, vert_inds = make_scene_cloud(rng)
        write_ply(
            str(tp / f"{scene}.ply"),
            [xyz, rgb, labels, vert_inds],
            ["x", "y", "z", "red", "green", "blue", "class", "vert_ind"],
        )
        faces = rng.randint(0, len(xyz), (50, 3)).astype(np.int32)
        write_ply(
            str(tm / f"{scene}_mesh.ply"),
            [xyz, rgb, labels],
            ["x", "y", "z", "red", "green", "blue", "class"],
            triangular_faces=faces,
        )
    (root / "scannet_v2_val.txt").write_text(scenes[-1] + "\n")

    from pointasnl_tpu.cli import train_scannet_grid

    log_dir = str(tmp_path / "logs")
    best = train_scannet_grid.main(
        [
            "--data", str(root),
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "512",
            "--num_buffer", "64",
            "--debug",
            "--dp",
        ]
    )
    assert best >= 0.0
    assert os.path.exists(os.path.join(log_dir, "args.txt"))

    # eval-side DP: batch-sharded potential-vote rounds
    from pointasnl_tpu.cli import test_scannet_grid

    miou = test_scannet_grid.main(
        [
            "--data", str(root),
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--dump_dir", str(tmp_path / "dump"),
            "--num_votes", "0.001",
            "--max_rounds", "1",
            "--batch_size", "8",
            "--dp",
        ]
    )
    assert miou is not None and miou >= 0.0


def test_train_semantic_kitti_grid_dp(tmp_path_factory, tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path_factory.mktemp("kitti_grid_dp")
    for seq, n_scans in [("00", 3), ("08", 2)]:
        vel = root / seq / "velodyne"
        lab = root / seq / "labels"
        vel.mkdir(parents=True)
        lab.mkdir(parents=True)
        for i in range(n_scans):
            n = 3000
            pts = np.zeros((n, 4), np.float32)
            pts[:, :3] = (rng.rand(n, 3) - 0.5) * 15
            pts[:, 3] = rng.rand(n)
            raw_ids = np.asarray([0, 10, 40, 48, 50, 70], np.uint32)
            sem = raw_ids[rng.randint(0, len(raw_ids), n)]
            pts.tofile(vel / f"{i:06d}.bin")
            sem.astype(np.uint32).tofile(lab / f"{i:06d}.label")

    from pointasnl_tpu.cli import train_semantic_kitti_grid

    log_dir = str(tmp_path / "logs")
    best = train_semantic_kitti_grid.main(
        [
            "--data", str(root),
            "--log_dir", log_dir,
            "--batch_size", "8",
            "--num_point", "512",
            "--num_buffer", "64",
            "--first_subsampling_dl", "0.2",
            "--prepare_data",
            "--debug",
            "--dp",
        ]
    )
    assert best >= 0.0

    # eval-side DP: batch-sharded possibility-vote rounds + .label dump
    from pointasnl_tpu.cli import test_semantic_kitti_grid

    test_semantic_kitti_grid.main(
        [
            "--data", str(root),
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--save_dir", str(tmp_path / "pred"),
            "--test_id", "8",
            "--num_votes", "0.001",
            "--max_rounds", "1",
            "--batch_size", "8",
            "--dp",
        ]
    )
    pred_dir = tmp_path / "pred" / "sequences" / "08" / "predictions"
    assert any(f.endswith(".label") for f in os.listdir(pred_dir))
