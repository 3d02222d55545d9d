"""Optimizer factory objects.

The reference's configs point ``optimizer=`` sections at TF optimizer
classes (``tf.train.AdamOptimizer`` etc.); the class alias table maps
those names here, where each factory wraps the matching optax
transformation. ``learning_rate`` may be a float or a schedule callable
(functions.noam_decay etc.).
"""

from __future__ import annotations

from typing import Any, Callable, Union

import optax

Schedule = Union[float, Callable]


class Optimizer:
    """Base: subclasses build an optax.GradientTransformation."""

    def make(self) -> optax.GradientTransformation:
        raise NotImplementedError


class AdamOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = 1e-3,
                 beta1: float = 0.9, beta2: float = 0.999,
                 epsilon: float = 1e-8,
                 use_locking: bool = False, name: str = None) -> None:
        del use_locking, name
        self.learning_rate = learning_rate
        self.beta1 = beta1
        self.beta2 = beta2
        self.epsilon = epsilon

    def make(self):
        return optax.adam(self.learning_rate, b1=self.beta1,
                          b2=self.beta2, eps=self.epsilon)


# tf.contrib.opt.LazyAdamOptimizer maps here too (dense adam on TPU —
# scatter-sparse updates don't pay off under XLA)
LazyAdamOptimizer = AdamOptimizer


class GradientDescentOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = 0.1,
                 use_locking: bool = False, name: str = None) -> None:
        del use_locking, name
        self.learning_rate = learning_rate

    def make(self):
        return optax.sgd(self.learning_rate)


class MomentumOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = 0.1,
                 momentum: float = 0.9, use_nesterov: bool = False,
                 use_locking: bool = False, name: str = None) -> None:
        del use_locking, name
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.use_nesterov = use_nesterov

    def make(self):
        return optax.sgd(self.learning_rate, momentum=self.momentum,
                         nesterov=self.use_nesterov)


class AdadeltaOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = 1.0, rho: float = 0.95,
                 epsilon: float = 1e-8, use_locking: bool = False,
                 name: str = None) -> None:
        del use_locking, name
        self.learning_rate = learning_rate
        self.rho = rho
        self.epsilon = epsilon

    def make(self):
        return optax.adadelta(self.learning_rate, rho=self.rho,
                              eps=self.epsilon)


class RMSPropOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = 1e-3,
                 decay: float = 0.9, momentum: float = 0.0,
                 epsilon: float = 1e-10, use_locking: bool = False,
                 name: str = None) -> None:
        del use_locking, name
        self.learning_rate = learning_rate
        self.decay = decay
        self.momentum = momentum
        self.epsilon = epsilon

    def make(self):
        return optax.rmsprop(self.learning_rate, decay=self.decay,
                             momentum=self.momentum, eps=self.epsilon)


class AdafactorOptimizer(Optimizer):
    def __init__(self, learning_rate: Schedule = None,
                 name: str = None) -> None:
        del name
        self.learning_rate = learning_rate

    def make(self):
        return optax.adafactor(self.learning_rate)


def resolve_optimizer(optimizer: Any) -> optax.GradientTransformation:
    """Accept an Optimizer factory, a ready optax transform, or None."""
    if optimizer is None:
        return optax.adam(1e-4)
    if isinstance(optimizer, Optimizer):
        return optimizer.make()
    if isinstance(optimizer, optax.GradientTransformation):
        return optimizer
    raise TypeError(f"Cannot interpret optimizer {optimizer!r}")
