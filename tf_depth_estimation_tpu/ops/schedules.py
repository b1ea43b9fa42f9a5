"""Training-time weight schedules.

TPU-native home for ``tfutils.ease_out_quad`` (used to ramp the sig-loss weight at
``my_losses.py:57,139``), expressed as an optax-style ``step -> value`` function.
"""
from __future__ import annotations

import jax.numpy as jnp


def ease_out_quad(t, b: float, c: float, d: float):
    """Quadratic ease-out: value ramps from ``b`` to ``b + c`` over ``d`` steps.

    ``b + c * (1 - (1 - t/d)^2)`` for t < d, clamped to ``b + c`` afterwards —
    the tfutils easing the reference ramps its sig-loss weight with.
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    tt = jnp.clip(t / d, 0.0, 1.0)
    return b + c * (1.0 - (1.0 - tt) ** 2)


def make_ease_out_quad(target: float, ramp_steps: int):
    """optax-style schedule closure: step -> weight."""
    def schedule(step):
        return ease_out_quad(step, 0.0, target, float(ramp_steps))

    return schedule


def exponential_decay(lr: float, decay_steps: int, decay_rate: float, staircase: bool = True):
    """TF1 ``tf.train.exponential_decay`` parity (used at ``split_training.py:330-334``)."""
    def schedule(step):
        p = jnp.asarray(step, jnp.float32) / decay_steps
        if staircase:
            p = jnp.floor(p)
        return lr * decay_rate**p

    return schedule
