"""Jitted train/eval steps for classification and segmentation.

One step = the entire reference sess.run (train.py:246-248) as a single
XLA program: forward (FPS/kNN/attention on-device), loss, backward, optimizer
update, BN stat update. Under a data mesh the same step runs SPMD — the batch
is sharded on the 'data' axis, gradients and BN batch moments reduce over ICI
automatically (the NCCL-free equivalent of an allreduce, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pointasnl_tpu.nn.losses import classification_loss, segmentation_loss


def make_train_step(
    *,
    bn_schedule: Callable,
    task: str = "cls",
    uniform_weight: float = 0.0,
    weights_decay: float = 1e-4,
    repulsion_radius: float = 0.07,
    donate: bool = True,
):
    """Build a jitted train step.

    task='cls': batch = {'points': (B,N,C), 'labels': (B,)}
    task='seg': batch = {'points': (B,N,C), 'labels': (B,N), 'smpw': (B,N)}
    """
    if task not in ("cls", "seg"):
        raise ValueError(f"unknown task {task!r}")

    def train_step(state, batch, dropout_rng):
        bn_momentum = bn_schedule(state.step)
        step_rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            (logits, end_points), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                training=True,
                bn_momentum=bn_momentum,
                rngs={"dropout": step_rng},
                mutable=["batch_stats"],
            )
            if task == "cls":
                loss, aux = classification_loss(
                    logits,
                    batch["labels"],
                    params,
                    l1_xyz=end_points["l1_xyz"],
                    uniform_weight=uniform_weight,
                    weights_decay=weights_decay,
                )
            else:
                loss, aux = segmentation_loss(
                    logits,
                    batch["labels"],
                    batch["smpw"],
                    params,
                    l1_xyz=end_points["l1_xyz"],
                    uniform_weight=uniform_weight,
                    weights_decay=weights_decay,
                    radius=repulsion_radius,
                )
            return loss, (aux, updates["batch_stats"], logits)

        (loss, (aux, new_batch_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_batch_stats)

        preds = jnp.argmax(logits, axis=-1)
        correct = (preds == batch["labels"]).astype(jnp.float32)
        metrics = dict(aux)
        metrics["loss"] = loss
        metrics["accuracy"] = jnp.mean(correct)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(*, task: str = "cls"):
    """Jitted eval step returning logits (for vote pooling) and loss-free metrics."""

    def eval_step(state, batch):
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["points"],
            training=False,
            bn_momentum=0.9,
        )
        preds = jnp.argmax(logits, axis=-1)
        correct = (preds == batch["labels"]).astype(jnp.float32)
        return logits, {"accuracy": jnp.mean(correct)}

    return jax.jit(eval_step)


def make_predict_step():
    """Jitted forward pass returning logits only (test-time voting loops)."""

    def predict_step(state, points):
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            training=False,
            bn_momentum=0.9,
        )
        return logits

    return jax.jit(predict_step)
