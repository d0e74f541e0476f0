"""Data subsystem tests: augmentations, grid subsampling (numpy vs C++),
ModelNet batch iterator on synthetic files, KITTI config tables."""

import os

import numpy as np
import pytest

from pointasnl_tpu.data import provider
from pointasnl_tpu.data.grid_subsampling import _numpy_grid_subsampling, compute
from pointasnl_tpu.data.modelnet import ModelNetDataset, pc_normalize
from pointasnl_tpu.data.semantic_kitti_config import (
    LEARNING_MAP,
    LEARNING_MAP_INV,
    MAPPED_CONTENT,
    default_config,
)

try:
    from pointasnl_tpu.native import grid_subsampling_ext as _ext
except Exception:
    _ext = None


# ------------------------------------------------------------- augmentations


def test_normalize_data(rng):
    x = rng.randn(3, 100, 3) * 5 + 2
    out = provider.normalize_data(x)
    np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-6)
    r = np.sqrt((out**2).sum(-1)).max(axis=1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-6)


def test_rotation_preserves_norms(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    rs = np.random.RandomState(3)
    out = provider.rotate_point_cloud(x, random_state=rs)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )
    # y (up) rotation: the y column is unchanged
    np.testing.assert_allclose(out[..., 1], x[..., 1], atol=1e-6)


def test_rotation_z_preserves_z(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    out = provider.rotate_point_cloud_z(x, random_state=np.random.RandomState(3))
    np.testing.assert_allclose(out[..., 2], x[..., 2], atol=1e-6)


def test_rotate_with_normal_consistency(rng):
    """Rotating xyz and normals by the same matrix preserves their dot product."""
    x = rng.randn(2, 30, 6).astype(np.float32)
    out = provider.rotate_point_cloud_with_normal(x.copy(), random_state=np.random.RandomState(1))
    dots_before = np.sum(x[..., :3] * x[..., 3:], -1)
    dots_after = np.sum(out[..., :3] * out[..., 3:], -1)
    np.testing.assert_allclose(dots_after, dots_before, rtol=1e-3, atol=1e-4)


def test_shuffle_points_same_permutation_per_batch(rng):
    x = np.tile(np.arange(10, dtype=np.float32)[None, :, None], (3, 1, 3))
    out = provider.shuffle_points(x, random_state=np.random.RandomState(0))
    # same permutation on every batch element
    assert (out[0] == out[1]).all() and (out[1] == out[2]).all()
    assert sorted(out[0, :, 0].tolist()) == list(range(10))


def test_jitter_bounded(rng):
    x = np.zeros((2, 100, 3), np.float32)
    out = provider.jitter_point_cloud(x, sigma=0.5, clip=0.05, random_state=np.random.RandomState(0))
    assert np.abs(out).max() <= 0.05 + 1e-7


def test_random_point_dropout_collapses_to_first(rng):
    x = rng.randn(2, 100, 3).astype(np.float32)
    rs = np.random.RandomState(12)
    out = provider.random_point_dropout(x, random_state=rs)
    for b in range(2):
        changed = np.any(out[b] != x[b], axis=1)
        assert np.all(out[b][changed] == out[b, 0])


def test_scale_and_shift_shapes(rng):
    x = rng.randn(2, 10, 3).astype(np.float32)
    s = provider.random_scale_point_cloud(x.copy(), random_state=np.random.RandomState(0))
    t = provider.shift_point_cloud(x.copy(), random_state=np.random.RandomState(0))
    assert s.shape == x.shape and t.shape == x.shape


# --------------------------------------------------------- grid subsampling


def voxel_oracle(points, sampleDl):
    """Brute-force voxel barycenters keyed by voxel coordinates."""
    origin = np.floor(points.min(0) / sampleDl) * sampleDl
    coords = np.floor((points - origin) / sampleDl).astype(np.int64)
    out = {}
    for i, c in enumerate(map(tuple, coords)):
        out.setdefault(c, []).append(points[i])
    return {c: np.mean(v, axis=0) for c, v in out.items()}


def _sort_rows(a):
    return a[np.lexsort(a.T[::-1])]


def test_grid_subsampling_barycenters(rng):
    pts = rng.rand(500, 3).astype(np.float32)
    sub, _, _ = _numpy_grid_subsampling(pts, None, None, 0.25)
    oracle = voxel_oracle(pts, 0.25)
    assert len(sub) == len(oracle)
    got = _sort_rows(np.asarray(sub, np.float64))
    want = _sort_rows(np.stack(list(oracle.values())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_subsampling_label_majority():
    pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [0.03, 0, 0], [0.9, 0, 0]], np.float32)
    cls = np.array([2, 2, 5, 7], np.int32)
    sub_p, _, sub_c = _numpy_grid_subsampling(pts, None, cls, 0.5)
    order = np.argsort(sub_p[:, 0])
    np.testing.assert_array_equal(sub_c[order], [2, 7])


@pytest.mark.skipif(_ext is None, reason="C++ extension not built")
def test_grid_subsampling_cpp_matches_numpy(rng):
    pts = rng.rand(2000, 3).astype(np.float32) * 3
    feats = rng.rand(2000, 5).astype(np.float32)
    cls = rng.randint(0, 8, 2000).astype(np.int32)
    p_np, f_np, c_np = _numpy_grid_subsampling(pts, feats, cls, 0.2)
    p_cc, f_cc, c_cc = _ext.compute(pts, features=feats, classes=cls, sampleDl=0.2)
    # Both sort by voxel id -> identical order.
    np.testing.assert_allclose(p_cc, p_np, atol=1e-5)
    np.testing.assert_allclose(f_cc, f_np, atol=1e-5)
    np.testing.assert_array_equal(c_cc, c_np)


def test_compute_dispatch_signature(rng):
    pts = rng.rand(100, 3).astype(np.float32)
    out = compute(pts, sampleDl=0.3)
    assert out.ndim == 2 and out.shape[1] == 3


# ----------------------------------------------------------------- modelnet


@pytest.fixture
def synthetic_modelnet(tmp_path, rng):
    root = tmp_path / "modelnet"
    names = ["airplane", "bed"]
    (root / "modelnet40_shape_names.txt").parent.mkdir(parents=True, exist_ok=True)
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    train_ids, test_ids = [], []
    for name in names:
        (root / name).mkdir(parents=True, exist_ok=True)
        for i in range(3):
            sid = f"{name}_{i:04d}"
            pts = rng.randn(128, 6).astype(np.float32)
            np.savetxt(root / name / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i < 2 else test_ids).append(sid)
    (root / "modelnet40_train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(test_ids) + "\n")
    return str(root)


def test_modelnet_dataset_batches(synthetic_modelnet):
    d = ModelNetDataset(
        synthetic_modelnet,
        batch_size=3,
        npoints=64,
        split="train",
        random_state=np.random.RandomState(0),
    )
    assert len(d) == 4
    assert d.num_channel() == 3
    data, labels = d.next_batch()
    assert data.shape == (3, 64, 3)
    assert labels.shape == (3,)
    assert d.has_next_batch()
    data2, labels2 = d.next_batch()
    assert data2.shape == (1, 64, 3)  # short tail batch
    assert not d.has_next_batch()
    # normalization applied
    np.testing.assert_allclose(
        np.max(np.linalg.norm(data[0], axis=-1)), 1.0, rtol=1e-5
    )


def test_modelnet_normals_and_uniform(synthetic_modelnet):
    d = ModelNetDataset(
        synthetic_modelnet,
        batch_size=2,
        npoints=32,
        split="test",
        normal_channel=True,
        uniform=True,
        random_state=np.random.RandomState(0),
    )
    data, labels = d.next_batch()
    assert data.shape == (2, 32, 6)


# -------------------------------------------------------------- kitti config


def test_kitti_learning_map_roundtrip():
    for train_id, raw_id in LEARNING_MAP_INV.items():
        assert LEARNING_MAP[raw_id] == train_id


def test_kitti_config_structure():
    cfg = default_config()
    assert set(cfg["split"].keys()) == {"train", "valid", "test"}
    assert cfg["split"]["valid"] == [8]
    assert len(cfg["learning_map_inv"]) == 20
    assert len(MAPPED_CONTENT) == 20


def test_laserscan_label_split(tmp_path, rng):
    from pointasnl_tpu.data.laserscan import SemLaserScan

    n = 50
    scan = rng.randn(n, 4).astype(np.float32)
    sem = rng.randint(0, 260, n).astype(np.uint32)
    inst = rng.randint(0, 5, n).astype(np.uint32)
    label = sem | (inst << 16)
    scan_file = tmp_path / "000000.bin"
    label_file = tmp_path / "000000.label"
    scan.tofile(scan_file)
    label.astype(np.uint32).tofile(label_file)

    s = SemLaserScan(nclasses=20, sem_color_dict={0: [0, 0, 0]})
    s.open_scan(str(scan_file))
    s.open_label(str(label_file))
    np.testing.assert_array_equal(s.sem_label, sem)
    np.testing.assert_array_equal(s.inst_label, inst)


def test_laserscan_vis_browser(tmp_path, rng):
    """The interactive browser: key navigation wraps, panels render, quit closes.

    Runs under Agg — key events are dispatched straight at the handler the
    way a GUI backend would.
    """
    import matplotlib

    matplotlib.use("Agg")
    from types import SimpleNamespace

    from pointasnl_tpu.data.laserscan import SemLaserScan
    from pointasnl_tpu.data.laserscan_vis import LaserScanVis

    scan_names, label_names = [], []
    for i in range(3):
        n = 200
        pts = rng.randn(n, 4).astype(np.float32)
        label = rng.randint(0, 20, n).astype(np.uint32)
        sf, lf = tmp_path / f"{i:06d}.bin", tmp_path / f"{i:06d}.label"
        pts.tofile(sf)
        label.tofile(lf)
        scan_names.append(str(sf))
        label_names.append(str(lf))

    s = SemLaserScan(nclasses=20, sem_color_dict={k: [10 * k, 5, 0] for k in range(20)})
    with pytest.raises(ValueError):
        LaserScanVis(s, scan_names, label_names, semantics=False, instances=True)

    vis = LaserScanVis(s, scan_names, label_names, semantics=True, instances=True)
    assert vis.offset == 0 and vis.total == 3
    vis.key_press(SimpleNamespace(key="n"))
    assert vis.offset == 1 and vis.action == "next"
    vis.key_press(SimpleNamespace(key="b"))
    vis.key_press(SimpleNamespace(key="b"))  # wraps below zero
    assert vis.offset == 2
    vis.key_press(SimpleNamespace(key="n"))  # wraps above total
    assert vis.offset == 0

    out = tmp_path / "frame.png"
    vis.save_frame(str(out))
    assert out.stat().st_size > 1000

    vis.key_press(SimpleNamespace(key="q"))
    assert vis.action == "quit" and vis._closed


def test_visualize_semantic_kitti_cli(tmp_path, rng):
    """Headless frame dump from a synthetic sequence, GT and predictions modes."""
    import matplotlib

    matplotlib.use("Agg")
    from pointasnl_tpu.cli.visualize_semantic_kitti import main

    seq = tmp_path / "sequences" / "08"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    pred = tmp_path / "preds" / "sequences" / "08" / "predictions"
    pred.mkdir(parents=True)
    for i in range(2):
        n = 150
        rng.randn(n, 4).astype(np.float32).tofile(seq / "velodyne" / f"{i:06d}.bin")
        rng.randint(0, 20, n).astype(np.uint32).tofile(seq / "labels" / f"{i:06d}.label")
        rng.randint(0, 20, n).astype(np.uint32).tofile(pred / f"{i:06d}.label")

    out = tmp_path / "frames"
    n_frames = main([
        "--data", str(tmp_path), "--out_dir", str(out), "--max_frames", "5",
    ])
    assert n_frames == 2
    assert sorted(p.name for p in out.iterdir()) == ["000000.png", "000001.png"]

    out2 = tmp_path / "frames_pred"
    n_frames = main([
        "--data", str(tmp_path), "--predictions", str(tmp_path / "preds"),
        "--out_dir", str(out2), "--max_frames", "1", "--offset", "1",
    ])
    assert n_frames == 1
    assert (out2 / "000001.png").stat().st_size > 1000
