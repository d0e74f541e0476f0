"""Train state: {params, batch_stats, opt_state, step} as one pytree.

The TPU-native replacement for the reference's TF1 graph variables +
tf.train.Saver checkpoints (train.py:123,155-158): a pure pytree that jits,
shards, donates, and checkpoints (orbax) as a unit. The LR and BN-momentum
schedules are pure functions of `step`, so restoring the state restores them.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
        )


def make_optimizer(
    name: str,
    lr_schedule: Callable,
    *,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """adam | momentum — the two reference options (train.py:150-154)."""
    if name == "adam":
        return optax.adam(lr_schedule)  # TF defaults: b1=.9 b2=.999 eps=1e-8
    if name == "momentum":
        return optax.sgd(lr_schedule, momentum=momentum)
    raise ValueError(f"unknown optimizer {name!r}")


def create_train_state(
    model,
    example_input,
    *,
    tx: optax.GradientTransformation,
    rng: Optional[jax.Array] = None,
    training: bool = True,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        example_input,
        training=training,
        bn_momentum=0.9,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
