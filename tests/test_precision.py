"""Mixed-precision policy tests: bf16 compute, f32 params/stats, learning."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.nn import precision
from pointasnl_tpu.nn.layers import PointConv
from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    make_train_step,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer
from tests.test_train import SmallCls


def test_policy_controls_compute_dtype(rng):
    x = jnp.asarray(rng.randn(2, 8, 4).astype(np.float32))
    layer = PointConv(16, bn=False)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, training=False)

    out_f32 = layer.apply(variables, x, training=False)
    assert out_f32.dtype == jnp.float32

    with precision.compute_dtype("bfloat16"):
        out_bf16 = layer.apply(variables, x, training=False)
    assert out_bf16.dtype == jnp.bfloat16
    # params stay float32
    assert variables["params"]["conv"]["kernel"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32), rtol=2e-2, atol=2e-2
    )


def test_bf16_train_step_learns(rng):
    b, n = 4, 128
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (b,)))
    batch = {"points": x, "labels": labels}
    with precision.compute_dtype("bfloat16"):
        model = SmallCls(num_class=4)
        tx = make_optimizer("adam", staircase_lr_schedule(1e-3, b, 1e9, 0.7))
        state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))
        step = make_train_step(bn_schedule=bn_momentum_schedule(b, 1e9), task="cls", donate=False)
        state, m0 = step(state, batch, jax.random.PRNGKey(1))
        for _ in range(10):
            state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    # params remained f32 (master weights)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_bf16_vs_f32_one_step_numerics_gate(rng):
    """One full train step bf16 vs f32 agrees within tolerance (loss + update
    norms), so the precision switch can't silently rot (VERDICT r1 item 9)."""
    b, n = 4, 128
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (b,)))
    batch = {"points": x, "labels": labels}

    def one_step(dtype):
        # SGD so the param delta IS lr * grad — Adam's eps regime would
        # amplify bf16 rounding on near-zero-gradient tensors into large
        # relative errors that say nothing about the precision policy.
        with precision.compute_dtype(dtype):
            model = SmallCls(num_class=4)
            tx = make_optimizer("momentum", staircase_lr_schedule(1e-2, b, 1e9, 0.7))
            state = create_train_state(model, x, tx=tx, rng=jax.random.PRNGKey(0))
            step = make_train_step(
                bn_schedule=bn_momentum_schedule(b, 1e9), task="cls", donate=False
            )
            new_state, m = step(state, batch, jax.random.PRNGKey(1))
        update = jax.tree_util.tree_map(
            lambda a, c: np.asarray(a, np.float64) - np.asarray(c, np.float64),
            new_state.params,
            state.params,
        )
        norms = {
            path: float(np.linalg.norm(leaf))
            for path, leaf in jax.tree_util.tree_leaves_with_path(update)
        }
        return float(m["loss"]), norms

    loss32, norms32 = one_step("float32")
    loss16, norms16 = one_step("bfloat16")

    assert abs(loss16 - loss32) / max(abs(loss32), 1e-8) < 2e-2
    floor = 1e-2 * max(norms32.values())  # ignore near-zero-grad tensors
    for path in norms32:
        a, c = norms32[path], norms16[path]
        assert abs(a - c) < max(0.1 * a, floor), (path, a, c)
