"""End-to-end SemanticKITTI train/test CLI smoke on synthetic scans."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_kitti(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("kitti")
    # sequences 00 (train), 08 (valid): 2 scans each
    for seq in ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10", "08"]:
        vel = root / "sequences" / seq / "velodyne"
        lab = root / "sequences" / seq / "labels"
        vel.mkdir(parents=True)
        lab.mkdir(parents=True)
        n_scans = 2 if seq in ("00", "08") else 0
        for i in range(n_scans):
            n = 4000
            pts = (rng.rand(n, 4).astype(np.float32) - 0.5) * 20
            pts[:, 3] = rng.rand(n)
            raw_ids = np.asarray([0, 1, 10, 40, 48, 50, 70, 72], np.uint32)
            sem = raw_ids[rng.randint(0, len(raw_ids), n)]
            label = sem.astype(np.uint32)
            pts.tofile(vel / f"{i:06d}.bin")
            label.tofile(lab / f"{i:06d}.label")
    return str(root)


def test_train_and_test_kitti_cli(synthetic_kitti, tmp_path):
    from pointasnl_tpu.cli import test_semantic_kitti, train_semantic_kitti

    log_dir = str(tmp_path / "logs")
    best_iou = train_semantic_kitti.main(
        [
            "--data", synthetic_kitti,
            "--log_dir", log_dir,
            "--batch_size", "2",
            "--num_point", "512",
            "--with_remission",
            "--debug",
        ]
    )
    assert 0.0 <= best_iou <= 1.0

    miou = test_semantic_kitti.main(
        [
            "--data", synthetic_kitti,
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--dump_dir", str(tmp_path / "dump"),
            "--save_dir", str(tmp_path / "pred"),
            "--batch_size", "2",
            "--num_point", "512",
            "--num_votes", "1",
            "--with_remission",
            "--remap_inv",
            "--max_scans", "1",
        ]
    )
    assert 0.0 <= miou <= 1.0
    # .label file written with raw ids
    pred_dir = tmp_path / "pred" / "sequences" / "08" / "predictions"
    files = list(pred_dir.glob("*.label"))
    assert len(files) == 1
    out = np.fromfile(files[0], dtype=np.uint32)
    assert out.shape[0] == 4000
    valid_raw = {0, 10, 11, 15, 18, 20, 30, 31, 32, 40, 44, 48, 49, 50, 51, 70, 71, 72, 80, 81}
    assert set(np.unique(out)).issubset(valid_raw)

    # whole-scan single-pass inference (the TPU-native alternative to the
    # reference's strided block chopping): the entire 4000-point scan goes
    # through the model at once with blockwise NL attention
    miou_sp = test_semantic_kitti.main(
        [
            "--data", synthetic_kitti,
            "--model_path", log_dir,
            "--ckpt", "latest",
            "--dump_dir", str(tmp_path / "dump_sp"),
            "--save_dir", str(tmp_path / "pred_sp"),
            "--batch_size", "2",
            "--num_point", "512",
            "--num_votes", "1",
            "--with_remission",
            "--max_scans", "1",
            "--single_pass",
            "--pad_quantum", "512",
            "--nl_block_size", "512",
        ]
    )
    assert 0.0 <= miou_sp <= 1.0
    sp_files = list(
        (tmp_path / "pred_sp" / "sequences" / "08" / "predictions").glob("*.label")
    )
    assert len(sp_files) == 1
    out_sp = np.fromfile(sp_files[0], dtype=np.uint32)
    assert out_sp.shape[0] == 4000
    assert out_sp.max() < 20  # learning-ids (no --remap_inv)

    # point-sharded whole-scan single-pass over the 8-device mesh
    # (parallel/whole_scene.predict_scan_sharded behind --sharded): 4000-pt
    # scan dup-padded to 4096 = a multiple of 256 * 8 devices.
    # Runs in a FRESH subprocess WITHOUT the persistent compilation cache.
    # Root cause (r5, bisected): the persistent-cache-DESERIALIZED XLA:CPU
    # executable of this exact program — the suite's only one with
    # collectives inside a lax.scan ring (--nl_block_size 512 => blockwise
    # NL over a ppermute ring) — wedges its rendezvous (7 of 8 participants
    # arrive; with stock 40 s timeouts the runtime CHECK-aborts the whole
    # process, with raised timeouts every thread futex-parks at zero CPU).
    # A freshly COMPILED executable of the same program passes every time,
    # as do all the suite's cached collective programs without in-loop
    # collectives. Compiling fresh here costs ~90 s and removes the only
    # known deserialization-unsafe program from the long-lived suite
    # process. See CLAUDE.md "XLA:CPU collectives" notes.
    import json
    import subprocess
    import sys

    shard_args = [
        "--data", synthetic_kitti,
        "--model_path", log_dir,
        "--ckpt", "latest",
        "--dump_dir", str(tmp_path / "dump_shard"),
        "--save_dir", str(tmp_path / "pred_shard"),
        "--batch_size", "2",
        "--num_point", "512",
        "--num_votes", "1",
        "--with_remission",
        "--max_scans", "1",
        "--single_pass",
        "--sharded",
        "--pad_quantum", "2048",
        "--nl_block_size", "512",
    ]
    child = (
        "import json, sys\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_cpu_enable_async_dispatch', False)\n"
        "from pointasnl_tpu.cli import test_semantic_kitti\n"
        f"miou = test_semantic_kitti.main(json.loads({json.dumps(shard_args)!r}))\n"
        "assert miou is not None and 0.0 <= miou <= 1.0, miou\n"
    )
    child_env = dict(os.environ)
    # The cli package auto-enables its own persistent cache; without this
    # opt-out the child would LOAD the poisoned deserialized executable
    # that a previous (passing, freshly-compiling) run persisted there.
    child_env["POINTASNL_NO_CACHE"] = "1"
    subprocess.run(
        [sys.executable, "-c", child],
        check=True,
        timeout=900,
        env=child_env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    shard_files = list(
        (tmp_path / "pred_shard" / "sequences" / "08" / "predictions").glob("*.label")
    )
    assert len(shard_files) == 1
    assert np.fromfile(shard_files[0], dtype=np.uint32).shape[0] == 4000
