"""Finite-difference gradient checks (SURVEY.md §4(b)), float32 tolerances.

The reference hand-wrote CUDA gradients for gather/group/interpolate
(tf_sampling_g.cu:186-192, tf_grouping_g.cu:60-78,
tf_interpolate.cpp:191-262); here they fall out of autodiff, and these
checks pin them against central differences so a custom-VJP regression
(e.g. a future Pallas backward) cannot silently change semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from pointasnl_tpu.ops import geometry as g


def test_gather_point_fd(rng):
    pts = jnp.asarray(rng.randn(2, 32, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 32, (2, 8)).astype(np.int32))
    check_grads(lambda p: g.gather_point(p, idx), (pts,), order=1,
                modes=["rev"], atol=2e-3, rtol=2e-3)


def test_group_point_fd(rng):
    pts = jnp.asarray(rng.randn(2, 24, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 24, (2, 6, 4)).astype(np.int32))
    check_grads(lambda p: g.group_point(p, idx), (pts,), order=1,
                modes=["rev"], atol=2e-3, rtol=2e-3)


def test_three_interpolate_fd(rng):
    pts = jnp.asarray(rng.randn(1, 16, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (1, 10, 3)).astype(np.int32))
    w = jax.nn.softmax(jnp.asarray(rng.randn(1, 10, 3)), axis=-1).astype(jnp.float32)
    check_grads(lambda p, ww: g.three_interpolate(p, idx, ww), (pts, w),
                order=1, modes=["rev"], atol=2e-3, rtol=2e-3)


def test_pairwise_sqdist_fd(rng):
    q = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32) * 2)
    s = jnp.asarray(rng.randn(1, 9, 3).astype(np.float32) * 2)
    check_grads(lambda a, b: g.pairwise_sqdist(a, b), (q, s), order=1,
                modes=["rev"], atol=5e-3, rtol=5e-3)
