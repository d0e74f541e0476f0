"""Raw-ScanNet preprocessing tests: mesh -> rasterized/subsampled plys and
ply -> pickle, on a synthetic scene."""

import json
import os
import pickle

import numpy as np
import pytest

from pointasnl_tpu.data.ply import write_ply


def make_synthetic_scene(root, scene, rng, labeled=True):
    """A toy scene: a coarse triangulated grid with rgb + segment labels."""
    scan_dir = root / "scans" / scene
    scan_dir.mkdir(parents=True)

    # 5x5 vertex grid in the xy plane -> 32 triangles
    g = np.linspace(0, 1.0, 5)
    xx, yy = np.meshgrid(g, g)
    verts = np.stack([xx.ravel(), yy.ravel(), 0.1 * rng.rand(25)], 1).astype(np.float32)
    faces = []
    for i in range(4):
        for j in range(4):
            a = i * 5 + j
            faces.append([a, a + 1, a + 5])
            faces.append([a + 1, a + 6, a + 5])
    faces = np.asarray(faces, np.int32)
    rgb = (rng.rand(25, 3) * 255).astype(np.uint8)

    write_ply(
        str(scan_dir / f"{scene}_vh_clean_2.ply"),
        [verts, rgb],
        ["x", "y", "z", "red", "green", "blue"],
        triangular_faces=faces,
    )

    if labeled:
        # axis alignment (identity)
        (scan_dir / f"{scene}.txt").write_text(
            "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n"
        )
        # two segments: left half / right half of the grid
        seg_indices = (verts[:, 0] > 0.5).astype(int).tolist()
        (scan_dir / f"{scene}_vh_clean_2.0.010000.segs.json").write_text(
            json.dumps({"segIndices": seg_indices})
        )
        (scan_dir / f"{scene}_vh_clean.aggregation.json").write_text(
            json.dumps(
                {
                    "segGroups": [
                        {"label": "wall", "segments": [0]},
                        {"label": "chair", "segments": [1]},
                    ]
                }
            )
        )
        # labels ply for prepare_scannet (NYU40 label per vertex)
        labels = np.where(verts[:, 0] > 0.5, 5, 1).astype(np.int32)  # chair=5, wall=1
        write_ply(
            str(scan_dir / f"{scene}_vh_clean_2.labels.ply"),
            [verts, labels],
            ["x", "y", "z", "label"],
        )
    return verts, faces


@pytest.fixture
def synthetic_raw_scannet(tmp_path):
    rng = np.random.RandomState(0)
    scene = "scene0000_00"
    make_synthetic_scene(tmp_path, scene, rng)
    # label name -> NYU id tsv (col 1 = name, col 4 = nyu40 id)
    tsv = "id\traw_category\tcategory\tcount\tnyu40id\n"
    tsv += "1\twall\twall\t100\t1\n2\tchair\tchair\t50\t5\n"
    (tmp_path / "scannetv2-labels.combined.tsv").write_text(tsv)
    (tmp_path / "scannet_v2_val.txt").write_text("")  # no val scenes
    (tmp_path / "scannetv2_train.txt").write_text(scene + "\n")
    return tmp_path, scene


def test_grid_prepare_pointcloud_ply(synthetic_raw_scannet):
    from pointasnl_tpu.data.ply import read_ply
    from pointasnl_tpu.data.scannet_grid import ScannetGridDataset

    root, scene = synthetic_raw_scannet
    ds = ScannetGridDataset(
        str(root), npoint=128, random_state=np.random.RandomState(0), prepare=True
    )
    out_ply = root / "training_points" / f"{scene}.ply"
    mesh_ply = root / "training_meshes" / f"{scene}_mesh.ply"
    assert out_ply.exists() and mesh_ply.exists()

    data = read_ply(str(out_ply))
    assert {"x", "y", "z", "red", "green", "blue", "class", "vert_ind"} <= set(
        data.dtype.names
    )
    # rasterized + 1cm-subsampled: far more points than the 25 vertices
    assert len(data) > 100
    # labels transferred from nearest vertices: only wall(1) / chair(5)
    assert set(np.unique(data["class"])) <= {1, 5}
    # left half wall, right half chair (up to boundary effects)
    left = data["x"] < 0.3
    assert (data["class"][left] == 1).mean() > 0.9

    mesh_data, faces = read_ply(str(mesh_ply), triangular_mesh=True)
    assert faces.shape[1] == 3


def test_prepare_scannet_pickle(synthetic_raw_scannet):
    from pointasnl_tpu.data.prepare_scannet import gen_pickle

    root, scene = synthetic_raw_scannet
    out = gen_pickle(split="train", root=str(root), out_dir=str(root))
    with open(out, "rb") as f:
        scene_data = pickle.load(f)
        scene_labels = pickle.load(f)
        scene_ids = pickle.load(f)
        scene_nums = pickle.load(f)
    assert len(scene_data) == 1
    pts = scene_data[0]
    assert pts.shape[1] == 6  # xyz + rgb
    # NYU 1 -> class 1 (wall), NYU 5 -> class 5 (bed slot in 21-class map)
    assert set(np.unique(scene_labels[0])).issubset(set(range(21)))
    assert scene_nums[0] == 25
