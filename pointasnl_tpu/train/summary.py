"""Metric writers: the tf.summary replacement (SURVEY.md §5.5).

The reference logs scalars (loss/accuracy/lr/bn_decay) through tf.summary
FileWriters per split (train.py:125-170). Here:

- `CsvMetricWriter`: dependency-free per-split csv files (step, name, value);
- `TensorBoardMetricWriter`: flax.metrics.tensorboard wrapper (same scalars,
  viewable in TensorBoard) when the backend is available;
- `MetricWriter.create`: picks TensorBoard when possible, else CSV.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional, Union

Number = Union[int, float]


class CsvMetricWriter:
    def __init__(self, logdir: str, split: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"metrics_{split}.csv")
        new = not os.path.exists(self.path)
        self._fh = open(self.path, "a", newline="")
        self._writer = csv.writer(self._fh)
        if new:
            self._writer.writerow(["step", "name", "value"])

    def scalar(self, name: str, value: Number, step: int):
        self._writer.writerow([int(step), name, float(value)])

    def scalars(self, metrics: Dict[str, Number], step: int):
        for k, v in metrics.items():
            self.scalar(k, v, step)

    def histogram(self, name: str, values, step: int, bins: int = 30):
        """Summarized as quantile scalars (csv backend has no histogram type)."""
        import numpy as np

        v = np.asarray(values).ravel()
        for q in (0, 25, 50, 75, 100):
            self.scalar(f"{name}_p{q}", float(np.percentile(v, q)), step)

    def flush(self):
        self._fh.flush()

    def close(self):
        self._fh.close()


class TensorBoardMetricWriter:
    def __init__(self, logdir: str, split: str = "train"):
        from flax.metrics import tensorboard

        self._w = tensorboard.SummaryWriter(os.path.join(logdir, split))

    def scalar(self, name: str, value: Number, step: int):
        self._w.scalar(name, float(value), int(step))

    def scalars(self, metrics: Dict[str, Number], step: int):
        for k, v in metrics.items():
            self.scalar(k, v, step)

    def histogram(self, name: str, values, step: int, bins: int = 30):
        """Full histograms (e.g. the reference's ball-query count histogram,
        pointasnl_util.py:364)."""
        self._w.histogram(name, values, int(step), bins=bins)

    def flush(self):
        self._w.flush()

    def close(self):
        self._w.close()


class MetricWriter:
    @staticmethod
    def create(logdir: str, split: str = "train", backend: Optional[str] = None):
        if backend == "csv":
            return CsvMetricWriter(logdir, split)
        if backend in (None, "tensorboard"):
            try:
                return TensorBoardMetricWriter(logdir, split)
            except Exception:
                if backend == "tensorboard":
                    raise
        return CsvMetricWriter(logdir, split)
