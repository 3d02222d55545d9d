"""Generic trainer (reference nm/trainers/generic_trainer.py).

An ``Objective`` binds a decoder's loss into the training objective; the
trainer turns a list of objectives into one pure ``loss_fn(params, ctx)``
plus an optax transformation (clipping + optimizer). The runtime jit-
compiles the actual update step (see runtime.py) — under data
parallelism XLA inserts the gradient allreduce over the mesh's ICI from
the sharding annotations alone.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from ..model.part import Context
from .optimizers import resolve_optimizer


class Objective:
    """One weighted loss term (reference's Objective dataclass)."""

    def __init__(self, name: str, decoder,
                 loss: Callable[[Context], jnp.ndarray] = None,
                 gradients=None, weight: float = 1.0) -> None:
        self.name = name
        self.decoder = decoder
        self._loss = loss
        self.gradients = gradients  # kept for API parity; unused
        self.weight = weight

    def loss(self, ctx: Context) -> jnp.ndarray:
        if self._loss is not None:
            return self._loss(ctx)
        return self.decoder.cost(ctx)


class GenericTrainer:

    def __init__(self, objectives: List[Objective],
                 l1_weight: float = 0.0,
                 l2_weight: float = 0.0,
                 clip_norm: float = None,
                 optimizer=None,
                 var_scopes: List[str] = None,
                 var_collection: str = None,
                 name: str = None) -> None:
        del var_collection
        self.name = name or "trainer"
        self.objectives = objectives
        self.l1_weight = l1_weight
        self.l2_weight = l2_weight
        self.clip_norm = clip_norm
        self.optimizer = optimizer
        self.var_scopes = var_scopes

    # parts reachable through this trainer (for model collection)
    @property
    def all_parts(self):
        return [o.decoder for o in self.objectives]

    @property
    def loss_names(self) -> List[str]:
        return [o.name for o in self.objectives] + ["loss", "grad_norm"]

    # ------------------------------------------------------------------ #
    def losses(self, params: Any, batch: Dict[str, Any], rng: Any) -> Dict[str, jnp.ndarray]:
        """Per-objective (+aux) losses; one evaluation path with
        :meth:`total_loss` so the dicts can never drift apart."""
        return self.total_loss(params, batch, rng)[1]

    def total_loss(self, params: Any, batch: Dict[str, Any], rng: Any):
        """Returns (scalar total, per-objective dict)."""
        ctx = Context(params, batch, train=True, rng=rng)
        losses = {}
        for objective in self.objectives:
            losses[objective.name] = objective.loss(ctx)
        total = sum(o.weight * losses[o.name] for o in self.objectives)
        # auxiliary losses parts registered during the forward pass
        # (MoE balance terms etc.; pre-weighted by their owners)
        for key, value in ctx.aux_losses.items():
            total = total + value
            losses[f"aux/{key}"] = value
        if self.l1_weight or self.l2_weight:
            leaves = jax.tree_util.tree_leaves(self._trainable(params))
            if self.l1_weight:
                total = total + self.l1_weight * sum(
                    jnp.sum(jnp.abs(x)) for x in leaves)
            if self.l2_weight:
                total = total + self.l2_weight * sum(
                    jnp.sum(jnp.square(x)) for x in leaves)
        return total, losses

    def _trainable(self, params):
        if not self.var_scopes:
            return params
        return {k: v for k, v in params.items() if k in self.var_scopes}

    def mask_frozen_grads(self, grads: Any):
        """Zero gradients of parts outside var_scopes."""
        if not self.var_scopes:
            return grads
        return {
            k: (v if k in self.var_scopes
                else jax.tree_util.tree_map(jnp.zeros_like, v))
            for k, v in grads.items()}

    def make_optax(self) -> optax.GradientTransformation:
        tx = resolve_optimizer(self.optimizer)
        if self.clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(self.clip_norm), tx)
        return tx

    @property
    def updates_per_batch(self) -> int:
        return 1
