"""Flagship SEG-pipeline recipe validation on synthetic scenes (slow, gated).

VERDICT r2 item 5: the cls recipe had a multi-epoch e2e
(test_recipe_e2e.py); the flagship path — grid-sample prepare ->
train_scannet_grid (potential crops, EMA validation, vote-projection eval)
-> test_scannet_grid (potential-driven voting to mesh vertices) — did not.
This runs the REAL CLI trainer/tester over procedurally generated indoor
scenes whose labels are a deterministic function of geometry
(data/synthetic.py:labeled_surface_scene: floor=2, wall=1, boxes=3), so
mIoU far above chance is achievable and asserts actual learning.

Behavioral contract: /root/reference/ScanNet/train_scannet_grid.py:239-432
and test_scannet_grid.py:98-442.
"""

import glob
import os

import numpy as np
import pytest

from pointasnl_tpu.data.ply import write_ply
from pointasnl_tpu.data.synthetic import labeled_surface_scene

# Opt-in (slow); see VALIDATION.md for the last recorded pass.
pytestmark = pytest.mark.skipif(
    not os.environ.get("POINTASNL_RUN_SLOW"),
    reason="slow recipe validation; set POINTASNL_RUN_SLOW=1 to run",
)


@pytest.fixture(scope="module")
def synthetic_scene_root(tmp_path_factory):
    rng = np.random.RandomState(11)
    root = tmp_path_factory.mktemp("seg_scenes")
    tp = root / "training_points"
    tm = root / "training_meshes"
    tp.mkdir()
    tm.mkdir()
    scenes = [f"scene{i:04d}_00" for i in range(8)]
    val_scenes = scenes[-2:]
    for scene in scenes:
        xyz, labels = labeled_surface_scene(rng, n=6000)
        rgb = (rng.rand(len(xyz), 3) * 255).astype(np.uint8)
        vert_inds = np.arange(len(xyz), dtype=np.int32)
        write_ply(
            str(tp / f"{scene}.ply"),
            [xyz, rgb, labels, vert_inds],
            ["x", "y", "z", "red", "green", "blue", "class", "vert_ind"],
        )
        faces = rng.randint(0, len(xyz), (60, 3)).astype(np.int32)
        write_ply(
            str(tm / f"{scene}_mesh.ply"),
            [xyz, rgb, labels],
            ["x", "y", "z", "red", "green", "blue", "class"],
            triangular_faces=faces,
        )
    (root / "scannet_v2_val.txt").write_text("\n".join(val_scenes) + "\n")
    return str(root)


def test_seg_grid_recipe_learns(synthetic_scene_root, tmp_path):
    from pointasnl_tpu.cli import test_scannet_grid, train_scannet_grid

    log_dir = str(tmp_path / "logs")
    best_vote_iou = train_scannet_grid.main(
        [
            "--data", synthetic_scene_root,
            "--log_dir", log_dir,
            "--model", "pointasnl_sem_seg_res",
            "--batch_size", "4",
            "--num_point", "1024",
            "--num_buffer", "128",
            "--epoch_sample", "128",
            "--validation_size", "16",
            "--max_epoch", "8",
            "--snapshot_gap", "4",
            "--learning_rate", "0.002",
            "--max_to_keep", "3",
        ]
    )
    # 3 semantic classes determined by geometry; random logits give ~25
    # rebalanced mIoU. The recipe must clear that decisively.
    assert best_vote_iou >= 50.0, f"seg recipe failed to learn: {best_vote_iou}"

    # args.txt round trip + checkpoint retention were active in a real run.
    from pointasnl_tpu.train.checkpoint import list_epochs
    from pointasnl_tpu.utils import load_args

    assert load_args(log_dir)["model"] == "pointasnl_sem_seg_res"
    assert len(list_epochs(log_dir)) == 3  # max_to_keep=3 over 8 epochs

    # Potential-voted tester reloads args.txt + best ckpt and reprojects
    # subcloud probs to mesh vertices.
    miou = test_scannet_grid.main(
        [
            "--data", synthetic_scene_root,
            "--model_path", log_dir,
            "--ckpt", "best",
            "--dump_dir", str(tmp_path / "dump"),
            "--num_votes", "1.5",
            "--max_rounds", "6",
        ]
    )
    assert miou >= 50.0, f"voted eval below learning bar: {miou}"
    # the tester logged per-round potentials and wrote its artifacts
    assert glob.glob(str(tmp_path / "dump" / "*" / "log_test.txt"))
