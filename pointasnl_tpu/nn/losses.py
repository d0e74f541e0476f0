"""Loss functions matching the reference's effective training objectives.

The reference mixes two regularization idioms (SURVEY.md §7 "hard parts"):
per-layer `weight_decay` hooks into a TF collection (dead in practice — the
trainers never pass weight_decay, utils/tf_util.py:59-69 defaults to None) and
an explicit L2 over every variable whose name contains 'weights'
(models/pointasnl_cls.py:58-59, models/pointasnl_sem_seg.py:59-60). Here the
single live path is `l2_regularization` over dense/conv kernels.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def softmax_cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean sparse softmax CE — tf.nn.sparse_softmax_cross_entropy_with_logits
    + reduce_mean (models/pointasnl_cls.py:60-61)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.mean(nll)


def weighted_softmax_cross_entropy(logits: Array, labels: Array, weights: Array) -> Array:
    """Weighted sparse softmax CE with TF's SUM_BY_NONZERO_WEIGHTS reduction.

    Matches tf.losses.sparse_softmax_cross_entropy(labels, logits, weights)
    (models/pointasnl_sem_seg.py:61): sum(w * ce) / count_nonzero(w).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    num_nonzero = jnp.maximum(jnp.sum((weights != 0).astype(jnp.float32)), 1.0)
    return jnp.sum(nll * weights) / num_nonzero


def l2_regularization(params: Any, key_name: str = "kernel") -> Array:
    """0.5 * sum(w^2) over all dense/conv kernels (the 'weights' vars).

    tf.nn.l2_loss(v) = sum(v^2)/2 per variable; the models sum these over
    every variable named '*weights*' — i.e. conv/FC kernels, not biases or BN
    scale/offset (models/pointasnl_cls.py:58).
    """
    total = jnp.float32(0.0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", None) for p in path]
        if key_name in names:
            total = total + 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def classification_loss(
    logits: Array,
    labels: Array,
    params: Any,
    *,
    l1_xyz: Optional[Array] = None,
    uniform_weight: float = 0.0,
    weights_decay: float = 1e-4,
) -> tuple[Array, dict]:
    """Total classification loss (models/pointasnl_cls.py:55-70)."""
    from pointasnl_tpu import ops

    classify = softmax_cross_entropy(logits, labels)
    reg = weights_decay * l2_regularization(params)
    if uniform_weight > 0:
        uniform = ops.repulsion_loss(l1_xyz, nsample=20, radius=0.07)
    else:
        uniform = classify  # mirrors the reference's placeholder (:64-65)
    total = classify + uniform_weight * uniform + reg
    return total, {"classify_loss": classify, "uniform_loss": uniform, "reg_loss": reg}


def segmentation_loss(
    logits: Array,
    labels: Array,
    smpw: Array,
    params: Any,
    *,
    l1_xyz: Array,
    uniform_weight: float = 0.01,
    weights_decay: float = 1e-4,
    radius: float = 0.07,
) -> tuple[Array, dict]:
    """Total segmentation loss (models/pointasnl_sem_seg.py:53-68).

    The reference's `weight_reg = add_n(collection 'losses')` term is dead
    (no trainer passes weight_decay into get_model, so the collection holds
    nothing) and is intentionally omitted.
    """
    from pointasnl_tpu import ops

    classify = weighted_softmax_cross_entropy(logits, labels, smpw)
    reg = weights_decay * l2_regularization(params)
    uniform = ops.repulsion_loss(l1_xyz, nsample=20, radius=radius)
    total = classify + uniform_weight * uniform + reg
    return total, {"classify_loss": classify, "uniform_loss": uniform, "reg_loss": reg}
