"""Learning-rate schedules and utility functions
(reference nm/functions.py). Schedules are callables ``step -> lr``
consumable by optax."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def noam_decay(learning_rate: float, model_dimension: int,
               warmup_steps: int = 4000):
    """Transformer LR schedule (Vaswani et al. 2017)."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return (learning_rate * model_dimension ** -0.5
                * jnp.minimum(step ** -0.5,
                              step * warmup_steps ** -1.5))
    return schedule


def piecewise_constant(boundaries: Sequence[float],
                       values: Sequence[float]) -> Callable:
    """Step-function schedule: values[i] until boundaries[i]."""
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        index = jnp.sum(step >= jnp.asarray(boundaries))
        return jnp.asarray(values)[index]
    return schedule


def exponential_decay(learning_rate: float, decay_steps: int,
                      decay_rate: float, staircase: bool = False):
    def schedule(step):
        import jax.numpy as jnp
        exponent = jnp.asarray(step, jnp.float32) / decay_steps
        if staircase:
            exponent = jnp.floor(exponent)
        return learning_rate * decay_rate ** exponent
    return schedule


def inverse_sigmoid_decay(param: float, rate: float):
    """k/(k+exp(step/k)) style decay (scheduled sampling)."""
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        return param * rate / (rate + jnp.exp(step / rate))
    return schedule
