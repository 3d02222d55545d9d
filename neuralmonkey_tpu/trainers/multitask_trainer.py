"""Round-robin multitask trainer
(reference nm/trainers/multitask_trainer.py): alternates child trainers
across steps; each child keeps its own optimizer state."""

from __future__ import annotations

from typing import List

from .generic_trainer import GenericTrainer


class MultitaskTrainer:

    def __init__(self, trainers: List[GenericTrainer],
                 name: str = None) -> None:
        if not trainers:
            raise ValueError("MultitaskTrainer needs at least one trainer")
        self.name = name or "multitask_trainer"
        self.trainers = trainers

    def select(self, step: int) -> GenericTrainer:
        return self.trainers[step % len(self.trainers)]

    @property
    def all_parts(self):
        parts = []
        for trainer in self.trainers:
            parts.extend(trainer.all_parts)
        return parts

    @property
    def loss_names(self):
        names = []
        for trainer in self.trainers:
            names.extend(trainer.loss_names)
        return list(dict.fromkeys(names))
