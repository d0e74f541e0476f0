"""Pallas TPU kernels behind the geometry op API (selected via ops.dispatch)."""
