"""Scalar regressor (reference nm/decoders/sequence_regressor.py):
predicts one float per example from encoder outputs."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import Stateful
from ...ops import nn


class SequenceRegressor(ModelPart):

    def __init__(self, name: str,
                 encoders: List[Stateful],
                 data_id: str,
                 layers: List[int] = None,
                 activation_fn=jax.nn.relu,
                 dropout_keep_prob: float = 1.0,
                 dimension: int = 1,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        if not encoders:
            raise ValueError("SequenceRegressor needs encoders")
        self.encoders = encoders
        self.data_id = data_id
        self.layers = layers or []
        self.activation_fn = activation_fn
        self.dropout_keep_prob = dropout_keep_prob
        self.dimension = dimension
        self.input_dim = sum(e.output_dim for e in encoders)

    @property
    def target_key(self) -> str:
        return f"{self.name}.targets"

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {"mlp": []}
        dim = self.input_dim
        for size in self.layers:
            rng, sub = jax.random.split(rng)
            params["mlp"].append(nn.linear_init(sub, dim, size))
            dim = size
        rng, sub = jax.random.split(rng)
        params["out"] = nn.linear_init(sub, dim, self.dimension)
        return params

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        values = dataset.get_series(self.data_id)
        arr = np.array([np.asarray(v, np.float32).reshape(-1)
                        for v in values], np.float32)
        return {self.target_key: arr,
                f"{self.name}.target_mask":
                    np.ones(len(values), np.float32)}

    @tensor
    def predictions(self, ctx: Context):
        params = ctx.get_params(self)
        x = jnp.concatenate([e.output(ctx) for e in self.encoders],
                            axis=-1)
        for i, layer in enumerate(params["mlp"]):
            x = self.activation_fn(nn.linear(layer, x))
            x = ctx.dropout(self, x, self.dropout_keep_prob, f"mlp_{i}")
        return nn.linear(params["out"], x)

    @tensor
    def train_loss(self, ctx: Context):
        predictions = self.predictions(ctx)
        targets = ctx.batch[self.target_key]
        weights = ctx.batch.get(
            f"{self.name}.target_mask",
            jnp.ones(targets.shape[:1], jnp.float32))
        per_example = jnp.mean((predictions - targets) ** 2, axis=-1)
        return jnp.sum(per_example * weights) / jnp.maximum(
            jnp.sum(weights), 1.0)

    def cost(self, ctx: Context):
        return self.train_loss(ctx)

    runtime_loss = train_loss

    @tensor
    def decoded(self, ctx: Context):
        return self.predictions(ctx)
