"""Learning-rate and BN-momentum schedules.

These are pure functions of the global step, matching the reference exactly so
checkpoint resume restores the schedules for free (SURVEY.md §5.4):

- staircase exponential LR decay with a 1e-5 floor   <- train.py:95-103
- scheduled BN momentum: bn_decay = min(0.99, 1 - 0.5 * 0.5^(t))
  where t = floor(step * batch_size / decay_step)     <- train.py:74-77,105-113
"""

from __future__ import annotations

import jax.numpy as jnp

BN_INIT_DECAY = 0.5
BN_DECAY_DECAY_RATE = 0.5
BN_DECAY_CLIP = 0.99
LR_FLOOR = 1e-5


def staircase_lr_schedule(base_lr: float, batch_size: int, decay_step: float, decay_rate: float):
    """tf.train.exponential_decay(staircase=True) on samples-seen, clipped at 1e-5."""

    def schedule(step):
        t = jnp.floor(step * batch_size / decay_step)
        lr = base_lr * jnp.power(decay_rate, t)
        return jnp.maximum(lr, LR_FLOOR)

    return schedule


def bn_momentum_schedule(batch_size: int, decay_step: float):
    """Scheduled BN EMA decay: starts at 0.5, rises toward the 0.99 clip."""

    def schedule(step):
        t = jnp.floor(step * batch_size / decay_step)
        bn_momentum = BN_INIT_DECAY * jnp.power(BN_DECAY_DECAY_RATE, t)
        return jnp.minimum(BN_DECAY_CLIP, 1.0 - bn_momentum)

    return schedule
