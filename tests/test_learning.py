"""Learning-dynamics sanity: the model can overfit a tiny fixed dataset."""

import numpy as np
import jax
import jax.numpy as jnp

from pointasnl_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    make_eval_step,
    make_train_step,
    staircase_lr_schedule,
)
from pointasnl_tpu.train.state import make_optimizer
from tests.test_train import SmallCls


def test_overfit_tiny_cls(rng):
    """8 fixed clouds / 4 classes -> near-perfect train accuracy in 60 steps."""
    b, n = 8, 128
    # well-separated synthetic classes: clusters at distinct offsets
    labels = np.arange(b) % 4
    x = rng.randn(b, n, 3).astype(np.float32) * 0.2
    offsets = np.array([[2, 0, 0], [0, 2, 0], [0, 0, 2], [-2, -2, 0]], np.float32)
    x += offsets[labels][:, None, :]
    batch = {"points": jnp.asarray(x), "labels": jnp.asarray(labels)}

    model = SmallCls(num_class=4)
    tx = make_optimizer("adam", staircase_lr_schedule(2e-3, b, 1e9, 0.7))
    state = create_train_state(model, batch["points"], tx=tx, rng=jax.random.PRNGKey(0))
    step = make_train_step(bn_schedule=bn_momentum_schedule(b, 1e9), task="cls", donate=False)

    accs = []
    for i in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        accs.append(float(metrics["accuracy"]))
    assert max(accs[-10:]) == 1.0, f"failed to overfit: final accs {accs[-10:]}"

    # eval mode (running BN stats) also classifies perfectly
    eval_step = make_eval_step(task="cls")
    logits, m = eval_step(state, batch)
    assert float(m["accuracy"]) == 1.0
