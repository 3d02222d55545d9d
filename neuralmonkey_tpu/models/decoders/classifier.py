"""Sequence classifier (reference nm/decoders/classifier.py): MLP over
concatenated encoder outputs -> one label per example."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import Stateful
from ...ops import nn
from ...vocabulary import Vocabulary


class Classifier(ModelPart):

    def __init__(self, name: str,
                 encoders: List[Stateful],
                 vocabulary: Vocabulary,
                 data_id: str,
                 layers: List[int] = None,
                 activation_fn=jax.nn.relu,
                 dropout_keep_prob: float = 0.5,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        if not encoders:
            raise ValueError("Classifier needs at least one encoder")
        self.encoders = encoders
        self.vocabulary = vocabulary
        self.data_id = data_id
        self.layers = layers or []
        self.activation_fn = activation_fn
        self.dropout_keep_prob = dropout_keep_prob
        self.input_dim = sum(e.output_dim for e in encoders)

    @property
    def label_key(self) -> str:
        return f"{self.name}.labels"

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {"mlp": []}
        dim = self.input_dim
        for size in self.layers:
            rng, sub = jax.random.split(rng)
            params["mlp"].append(nn.linear_init(sub, dim, size))
            dim = size
        rng, sub = jax.random.split(rng)
        params["logit"] = nn.linear_init(sub, dim,
                                         len(self.vocabulary))
        return params

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        labels = dataset.get_series(self.data_id)
        ids = np.array(
            [self.vocabulary.get_word_index(
                label[0] if isinstance(label, (list, tuple)) else label)
             for label in labels], np.int32)
        # validity mask: batch-pad rows (zero-padded) drop out of loss
        return {self.label_key: ids,
                f"{self.name}.label_mask":
                    np.ones(len(labels), np.float32)}

    # ------------------------------------------------------------------ #
    @tensor
    def logits(self, ctx: Context):
        params = ctx.get_params(self)
        x = jnp.concatenate([e.output(ctx) for e in self.encoders],
                            axis=-1)
        for i, layer in enumerate(params["mlp"]):
            x = self.activation_fn(nn.linear(layer, x))
            x = ctx.dropout(self, x, self.dropout_keep_prob,
                            f"mlp_{i}")
        return nn.linear(params["logit"], x)

    @tensor
    def train_loss(self, ctx: Context):
        logits = self.logits(ctx)
        labels = ctx.batch[self.label_key]
        weights = ctx.batch.get(
            f"{self.name}.label_mask",
            jnp.ones(labels.shape, jnp.float32))
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            log_probs, labels[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * weights) / jnp.maximum(
            jnp.sum(weights), 1.0)

    def cost(self, ctx: Context):
        return self.train_loss(ctx)

    runtime_loss = train_loss

    @tensor
    def decoded(self, ctx: Context):
        return jnp.argmax(self.logits(ctx), axis=-1)


# reference import-path compatibility
SequenceClassifier = Classifier
