"""Shared machinery for the grid (KPConv-style) dataset pipelines.

The reference assembles tf.data pipelines (generator -> map(augment) ->
batch(drop_remainder) -> prefetch, ScanNet/train_scannet_grid.py:144-155).
The TPU-native replacement keeps the stateful potential-based generators on
the host (they mutate cross-step state and produce ragged -> fixed-shape
crops) and replaces the graph plumbing with:
  - vectorized numpy augmentation identical to tf_augment_input
    (scannet_dataset_grid.py:586-645): per-cloud vertical rotation,
    anisotropic scale 0.9-1.1 with optional axis symmetry flips, sigma=0.001
    gaussian noise; plus the random color-drop (:564-568);
  - a background-thread prefetcher feeding fixed-shape numpy batches, which
    jax then overlaps with device compute (dispatch is async).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np


@dataclass
class GridConfig:
    """Pipeline/augmentation knobs (the reference folds these into args)."""

    batch_size: int = 8
    epoch_steps: int = 600
    validation_size: int = 50
    in_radius: float = 0.0  # >0: radius crop; 0: kNN crop of npoint+buffer
    augment_scale_anisotropic: bool = True
    augment_scale_min: float = 0.9
    augment_scale_max: float = 1.1
    augment_noise: float = 0.001
    augment_color: float = 1.0  # probability a cloud KEEPS its colors
    augment_rotation: str = "vertical"
    augment_symmetries: Sequence[bool] = field(default_factory=lambda: [True, False, False])


def augment_points(points: np.ndarray, config: GridConfig, rs: np.random.RandomState):
    """Augment one cloud's xyz (N, 3): rotation, anisotropic scale+flip, noise.

    Numpy equivalent of tf_augment_input (scannet_dataset_grid.py:586-645).
    Returns (augmented_points, scale(1,3), R(3,3)).
    """
    if config.augment_rotation == "vertical":
        theta = rs.uniform(0, 2 * np.pi)
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        points = points @ R
    elif config.augment_rotation == "none":
        R = np.eye(3, dtype=np.float32)
    else:
        raise ValueError(f"Unknown rotation augmentation: {config.augment_rotation}")

    if config.augment_scale_anisotropic:
        scale = rs.uniform(config.augment_scale_min, config.augment_scale_max, (1, 3))
    else:
        scale = np.full((1, 3), rs.uniform(config.augment_scale_min, config.augment_scale_max))
    for i in range(3):
        if config.augment_symmetries[i] and rs.random_sample() < 0.5:
            scale[0, i] *= -1
    points = points * scale.astype(np.float32)

    noise = rs.randn(*points.shape).astype(np.float32) * config.augment_noise
    return points + noise, scale.astype(np.float32), R


def maybe_drop_colors(colors: np.ndarray, config: GridConfig, rs: np.random.RandomState):
    """Randomly zero a cloud's colors with prob 1 - augment_color (:564-568)."""
    if rs.random_sample() >= config.augment_color:
        return np.zeros_like(colors)
    return colors


def batch_iterator(
    gen_fn: Callable[[], Iterator],
    batch_size: int,
    *,
    drop_remainder: bool = True,
) -> Iterator[List]:
    """Group per-example tuples into lists of length batch_size."""
    buf: List = []
    for item in gen_fn():
        buf.append(item)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf and not drop_remainder:
        yield buf


class Prefetcher:
    """Background-thread prefetch over an iterator (tf.data prefetch analog)."""

    _DONE = object()

    def __init__(self, iterator: Iterator, capacity: int = 8):
        self.q: "queue.Queue" = queue.Queue(maxsize=capacity)
        self.err: Optional[BaseException] = None

        def worker():
            try:
                for item in iterator:
                    self.q.put(item)
            except BaseException as e:  # propagate to consumer
                self.err = e
            finally:
                self.q.put(self._DONE)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._DONE:
            if self.err is not None:
                raise self.err
            raise StopIteration
        return item
