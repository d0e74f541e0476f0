"""Aux subsystem tests: pc_util, host kNN helpers, JaxIouEval, profiling, ply."""

import os

import numpy as np
import pytest

from pointasnl_tpu.data import pc_util
from pointasnl_tpu.data.ply import read_ply, write_ply
from pointasnl_tpu.ops.host_knn import knn_batch, knn_batch_distance_pick
from pointasnl_tpu.train.metrics import IouEval, JaxIouEval
from pointasnl_tpu.train.profiling import StepTimer


def test_volume_roundtrip(rng):
    pts = (rng.rand(100, 3) * 2 - 1).astype(np.float32)
    vol = pc_util.point_cloud_to_volume(pts, 12)
    assert vol.shape == (12, 12, 12)
    back = pc_util.volume_to_point_cloud(vol)
    assert back.shape[1] == 3
    assert 0 < len(back) <= 100


def test_volume_batch(rng):
    pts = (rng.rand(2, 50, 3) * 2 - 1).astype(np.float32)
    flat = pc_util.point_cloud_to_volume_batch(pts, vsize=8, flatten=True)
    assert flat.shape == (2, 512)


def test_volume_v2(rng):
    pts = (rng.rand(60, 3) * 2 - 1).astype(np.float32)
    vol = pc_util.point_cloud_to_volume_v2(pts, 4, num_sample=8)
    assert vol.shape == (4, 4, 4, 8, 3)


def test_three_views(rng):
    pts = rng.randn(64, 3).astype(np.float32)
    img = pc_util.point_cloud_three_views(pts)
    assert img.shape == (1500, 500)
    assert img.max() <= 1.0 + 1e-6


def test_host_knn_batch(rng):
    pts = rng.randn(2, 50, 3).astype(np.float32)
    q = pts[:, :10]
    idx = knn_batch(pts, q, 4)
    assert idx.shape == (2, 10, 4)
    # first neighbor of a support point is itself
    np.testing.assert_array_equal(idx[:, :, 0], np.arange(10)[None].repeat(2, 0))


def test_knn_batch_distance_pick_coverage(rng):
    pts = rng.randn(1, 100, 3).astype(np.float32)
    rs = np.random.RandomState(0)
    queries, idx = knn_batch_distance_pick(pts, 20, 4, random_state=rs)
    assert queries.shape == (1, 20, 3)
    assert idx.shape == (1, 20, 4)
    # coverage-aware: queries are distinct points
    uniq = {tuple(np.round(q, 5)) for q in queries[0]}
    assert len(uniq) == 20


def test_jax_iou_eval_matches_numpy(rng):
    preds = rng.randint(0, 5, 200)
    labels = rng.randint(0, 5, 200)
    ev_np = IouEval(5, ignore=[0])
    ev_np.addBatch(preds, labels)
    ev_jx = JaxIouEval(5, ignore=[0])
    ev_jx.addBatch(preds, labels)
    m_np, iou_np = ev_np.getIoU()
    m_jx, iou_jx = ev_jx.getIoU()
    np.testing.assert_allclose(m_jx, m_np, rtol=1e-9)
    np.testing.assert_allclose(iou_jx, iou_np, rtol=1e-9)
    np.testing.assert_allclose(ev_jx.getacc(), ev_np.getacc(), rtol=1e-9)


def test_step_timer():
    t = StepTimer(points_per_step=1000)
    for _ in range(3):
        with t.step():
            pass
    assert t.steps == 3
    assert "avg step" in t.summary()


def test_step_trace_window(tmp_path):
    """StepTraceWindow: traces exactly the first `steps` dispatches, writes an
    artifact, no-ops when disabled, and ends the trace if a dispatch raises."""
    import jax
    import jax.numpy as jnp

    from pointasnl_tpu.train.profiling import StepTraceWindow

    f = jax.jit(lambda x: x * 2)

    # disabled: nothing written, all methods no-op
    off = StepTraceWindow(str(tmp_path / "off"), enabled=False, log=lambda *_: None)
    off.traced(lambda: f(jnp.ones(8)))
    off.close()
    assert not (tmp_path / "off").exists()

    # enabled: window over the first 2 of 4 dispatches, artifact on disk
    msgs = []
    win = StepTraceWindow(str(tmp_path / "on"), enabled=True, steps=2, log=msgs.append)
    for _ in range(4):
        win.traced(lambda: f(jnp.ones(8)))
    win.close()
    assert len(msgs) == 1  # closed exactly once, by after(), not close()
    files = [fn for _, _, fs in os.walk(tmp_path / "on") for fn in fs]
    assert files, "no trace artifact written"

    # a raising dispatch ends the trace instead of leaking it open
    boom = StepTraceWindow(str(tmp_path / "err"), enabled=True, log=lambda *_: None)
    with pytest.raises(RuntimeError):
        boom.traced(lambda: (_ for _ in ()).throw(RuntimeError("dispatch failed")))
    assert not boom._tracing
    # the profiler accepts a fresh trace afterwards (state was cleaned up)
    again = StepTraceWindow(str(tmp_path / "again"), enabled=True, steps=1,
                            log=lambda *_: None)
    again.traced(lambda: f(jnp.ones(8)))
    again.close()


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(50, 3).astype(np.float32)
    rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 5, 50).astype(np.int32)
    path = str(tmp_path / "test.ply")
    write_ply(path, [pts, rgb, labels], ["x", "y", "z", "red", "green", "blue", "class"])
    data = read_ply(path)
    np.testing.assert_allclose(
        np.vstack([data["x"], data["y"], data["z"]]).T, pts, rtol=1e-6
    )
    np.testing.assert_array_equal(data["class"], labels)
    np.testing.assert_array_equal(data["red"], rgb[:, 0])


def test_ply_mesh_roundtrip(tmp_path, rng):
    pts = rng.randn(10, 3).astype(np.float32)
    faces = rng.randint(0, 10, (6, 3)).astype(np.int32)
    path = str(tmp_path / "mesh.ply")
    write_ply(path, [pts], ["x", "y", "z"], triangular_faces=faces)
    vertex, got_faces = read_ply(path, triangular_mesh=True)
    assert len(vertex) == 10
    np.testing.assert_array_equal(got_faces, faces)


def test_mesh_rasterize(rng):
    from pointasnl_tpu.data.mesh import cylinder_mesh, rasterize_mesh

    verts, faces = cylinder_mesh(np.array([0, 0, 0, 1.0, 0.5]))
    pts, vert_inds = rasterize_mesh(verts, faces, 0.05)
    assert pts.shape[0] == vert_inds.shape[0]
    assert pts.shape[0] > len(verts)  # densified
    assert vert_inds.max() < len(verts)


def test_native_knn_ext_matches_bruteforce(rng):
    """The C++ KD-tree extension vs an exact numpy oracle (sorted, stable)."""
    ext = pytest.importorskip("pointasnl_tpu.native.host_knn_ext")
    pts = rng.randn(500, 3).astype(np.float32)
    q = rng.randn(80, 3).astype(np.float32)
    got = ext.knn(pts, q, 12, omp=True)
    d2 = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :12]
    np.testing.assert_array_equal(got, want)
    got_b = ext.knn_batch(pts[None].repeat(2, 0), q[None].repeat(2, 0), 12, omp=True)
    np.testing.assert_array_equal(got_b[1], want)


def test_native_knn_duplicate_ties_and_k_gt_n():
    """Native extension parity on the hard cases: exact-duplicate ties must
    break toward the LOWER index (the device contract), and K > N must pad
    with the farthest valid neighbor at the caller's row stride (regression:
    the output was written with a min(K,N) stride into a K-stride array)."""
    ext = pytest.importorskip("pointasnl_tpu.native.host_knn_ext")
    rng = np.random.RandomState(3)
    base = rng.randn(20, 3).astype(np.float32)
    pts = np.concatenate([base, base])  # 40 points, every point duplicated
    idx = ext.knn(pts, pts[:5], 4)
    d2 = ((pts[:5][:, None] - pts[None]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1, kind="stable")[:, :4]
    np.testing.assert_array_equal(idx, want)

    small = base[:3]
    idx = ext.knn(small, small, 7)  # K=7 > N=3
    assert idx.shape == (3, 7)
    d2 = ((small[:, None] - small[None]) ** 2).sum(-1)
    want3 = np.argsort(d2, axis=1, kind="stable")
    np.testing.assert_array_equal(idx[:, :3], want3)
    np.testing.assert_array_equal(idx[:, 3:], np.repeat(want3[:, -1:], 4, axis=1))
    assert (idx < 3).all() and (idx >= 0).all()


def test_snapshot_sources(tmp_path):
    """Log-dir code backup (parity with /root/reference/train.py:67-70)."""
    import os

    from pointasnl_tpu.utils import snapshot_sources

    dst = snapshot_sources(str(tmp_path), "pointasnl_sem_seg_res",
                           extra_modules=(__file__,))
    names = set(os.listdir(dst))
    assert "sem_seg_res.py" in names
    assert "pointasnl.py" in names
    assert "layers.py" in names
    assert os.path.basename(__file__) in names
