"""Gradient-accumulation trainer
(reference nm/trainers/delayed_update_trainer.py).

The reference implemented accumulate/apply/reset as a three-phase TF
executable; on TPU the same semantics come from optax.MultiSteps — one
jitted step per batch, parameters update every ``batches_per_update``.
"""

from __future__ import annotations

from typing import List

import optax

from .generic_trainer import GenericTrainer, Objective


class DelayedUpdateTrainer(GenericTrainer):

    def __init__(self, batches_per_update: int,
                 objectives: List[Objective] = None,
                 decoders: List = None,
                 l1_weight: float = 0.0,
                 l2_weight: float = 0.0,
                 clip_norm: float = None,
                 optimizer=None,
                 var_scopes: List[str] = None,
                 var_collection: str = None,
                 name: str = None) -> None:
        if objectives is None:
            if decoders is None:
                raise ValueError("Need objectives or decoders")
            from .cross_entropy_trainer import xent_objective
            objectives = [xent_objective(d) for d in decoders]
        super().__init__(
            objectives=objectives, l1_weight=l1_weight,
            l2_weight=l2_weight, clip_norm=clip_norm,
            optimizer=optimizer, var_scopes=var_scopes,
            var_collection=var_collection, name=name)
        if batches_per_update < 1:
            raise ValueError("batches_per_update must be >= 1")
        self.batches_per_update = batches_per_update

    def make_optax(self):
        return optax.MultiSteps(
            super().make_optax(),
            every_k_schedule=self.batches_per_update)

    @property
    def updates_per_batch(self) -> int:
        return 1  # one optax step per batch; real update every k-th
