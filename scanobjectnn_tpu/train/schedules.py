"""Learning-rate and BatchNorm-momentum schedules.

Behavioral reference: /root/reference/pointnet2/train.py:116-134 —
  * LR: staircase exponential decay on SAMPLES seen (step·batch_size),
    clipped below at 1e-5 (get_learning_rate).
  * BN momentum (bn_decay): 1 − 0.5·0.5^floor(samples/decay_step), clipped
    above at 0.99 (get_bn_decay; BN_INIT_DECAY=0.5, rate 0.5).

Both are pure jnp functions of the integer step so they trace into the jitted
train step (no host round trip per batch).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["exponential_decay_lr", "step_exponential_decay_lr", "bn_momentum_schedule"]


def exponential_decay_lr(
    base_lr: float,
    batch_size: int,
    decay_step: int = 200_000,
    decay_rate: float = 0.7,
    staircase: bool = True,
    floor: float = 1e-5,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR(step) = max(base · rate^(step·bs/decay_step), floor)."""

    def schedule(step) -> jnp.ndarray:
        p = jnp.asarray(step, jnp.float32) * batch_size / decay_step
        if staircase:
            p = jnp.floor(p)
        return jnp.maximum(base_lr * jnp.power(decay_rate, p), floor)

    return schedule


def step_exponential_decay_lr(
    base_lr: float,
    decay_steps: int,
    decay_rate: float,
    floor: float,
    staircase: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR(step) = max(base · rate^floor(step/decay_steps), floor) — decay on
    global STEPS, the PointCNN settings-module schedule
    (tf.train.exponential_decay on global_step, PointCNN/train.py:160-162,
    clipped at learning_rate_min; vs the pointnet drivers' samples-based
    exponent in ``exponential_decay_lr``)."""

    def schedule(step) -> jnp.ndarray:
        p = jnp.asarray(step, jnp.float32) / decay_steps
        if staircase:
            p = jnp.floor(p)
        return jnp.maximum(base_lr * jnp.power(decay_rate, p), floor)

    return schedule


def bn_momentum_schedule(
    batch_size: int,
    decay_step: int = 200_000,
    init_decay: float = 0.5,
    decay_rate: float = 0.5,
    clip: float = 0.99,
    staircase: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """bn_decay(step) = min(clip, 1 − init·rate^(step·bs/decay_step))."""

    def schedule(step) -> jnp.ndarray:
        p = jnp.asarray(step, jnp.float32) * batch_size / decay_step
        if staircase:
            p = jnp.floor(p)
        momentum = init_decay * jnp.power(decay_rate, p)
        return jnp.minimum(clip, 1.0 - momentum)

    return schedule
