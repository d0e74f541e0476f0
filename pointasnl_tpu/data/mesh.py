"""Mesh utilities: rasterize a triangle mesh into a dense point cloud.

Same contract as the reference's utils/mesh.py:37 (rasterize_mesh): points at
~dl spacing over every face (interior grid + edges + vertices), plus for each
generated point the index of the nearest face vertex (used to transfer vertex
labels to rasterized points in the ScanNet grid preprocessing).

Deviation from the reference: faces whose longest side is < dl contribute
their centroid point WITH a vertex index (the reference drops those points
entirely because its small-face branch skips the accumulation step,
mesh.py:83-85 — a bug we do not replicate).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def rasterize_mesh(
    vertices: np.ndarray, faces: np.ndarray, dl: float, verbose: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate points at ~dl spacing over a triangle mesh.

    Returns:
      points: (P, 3) float32
      vert_inds: (P,) int — index into `vertices` of the nearest face vertex
    """
    # Drop degenerate faces (any side shorter than 1e-9).
    faces3D = vertices[faces, :]
    sides = np.stack([faces3D[:, i, :] - faces3D[:, i - 1, :] for i in [2, 0, 1]], axis=1)
    keep = np.min(np.linalg.norm(sides, axis=-1), axis=-1) > 1e-9
    faces = faces[keep]

    faces3D = vertices[faces, :]
    opposite_sides = np.stack(
        [faces3D[:, i, :] - faces3D[:, i - 1, :] for i in [2, 0, 1]], axis=1
    )
    lengths = np.linalg.norm(opposite_sides, axis=-1)

    all_points = []
    all_vert_inds = []
    for face_verts, face, l, fsides in zip(faces, faces3D, lengths, opposite_sides):
        if np.min(l) < 1e-9:
            continue

        face_points = []

        if np.max(l) < dl:
            # Tiny face: just its centroid.
            face_points.append(np.mean(face, axis=0, keepdims=True))
        else:
            # Interior grid spanned by the two shorter sides off the widest angle.
            A_idx = int(np.argmax(l))
            B_idx = (A_idx + 1) % 3
            C_idx = (A_idx + 2) % 3
            i_dir = -fsides[B_idx] / l[B_idx]
            j_dir = fsides[C_idx] / l[C_idx]
            s1 = (l[B_idx] % dl) / 2
            s2 = (l[C_idx] % dl) / 2
            x, y = np.meshgrid(np.arange(s1, l[B_idx], dl), np.arange(s2, l[C_idx], dl))
            pts = face[A_idx, :] + (x.ravel()[:, None] * i_dir + y.ravel()[:, None] * j_dir)
            pts = pts[x.ravel() / l[B_idx] + y.ravel() / l[C_idx] <= 1, :]
            face_points.append(pts)

            # Edge points.
            for edge_idx in range(3):
                e_dir = fsides[edge_idx] / l[edge_idx]
                start_idx = (edge_idx + 1) % 3
                s = (l[edge_idx] % dl) / 2
                t = np.arange(s, l[edge_idx], dl)
                face_points.append(face[start_idx, :] + t[:, None] * e_dir)

            # The three vertices themselves.
            face_points.append(face)

        pts = np.vstack(face_points)
        d2 = np.sum(np.square(pts[:, None, :] - face[None, :, :]), axis=2)
        all_vert_inds.append(face_verts[np.argmin(d2, axis=1)])
        all_points.append(pts)

    return np.vstack(all_points).astype(np.float32), np.hstack(all_vert_inds)


def cylinder_mesh(cylinder: np.ndarray, precision: int = 24):
    """Triangulated cylinder (center xyz, height, radius) — utils/mesh.py:124."""
    center = cylinder[:3]
    h = cylinder[3]
    r = cylinder[4]

    thetas = np.arange(precision) * (2.0 * np.pi / precision)
    circleX = r * np.cos(thetas)
    circleY = r * np.sin(thetas)
    top = np.vstack((circleX, circleY, np.full(precision, h / 2))).T
    bottom = np.vstack((circleX, circleY, np.full(precision, -h / 2))).T
    vertices = np.vstack(([[0, 0, h / 2], [0, 0, -h / 2]], top, bottom)) + center

    top_faces = [[0, 2 + i, 2 + ((i + 1) % precision)] for i in range(precision)]
    bottom_faces = [
        [1, 2 + precision + i, 2 + precision + ((i + 1) % precision)] for i in range(precision)
    ]
    side1 = [[2 + i, 2 + precision + i, 2 + precision + ((i + 1) % precision)] for i in range(precision)]
    side2 = [
        [2 + precision + ((i + 1) % precision), 2 + i, 2 + ((i + 1) % precision)]
        for i in range(precision)
    ]
    faces = np.array(top_faces + bottom_faces + side1 + side2, dtype=np.int32)
    return vertices.astype(np.float32), faces
