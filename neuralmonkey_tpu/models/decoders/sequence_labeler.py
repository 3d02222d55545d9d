"""Per-token sequence labeler (reference nm/decoders/sequence_labeler.py):
a projection over a TemporalStateful encoder -> one tag per input
token."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import TemporalStateful
from ...ops import nn
from ...vocabulary import Vocabulary


class SequenceLabeler(ModelPart):

    def __init__(self, name: str,
                 encoder: TemporalStateful,
                 vocabulary: Vocabulary,
                 data_id: str,
                 hidden_dim: int = None,
                 activation=jax.nn.relu,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.encoder = encoder
        self.vocabulary = vocabulary
        self.data_id = data_id
        self.hidden_dim = hidden_dim
        self.activation = activation
        self.dropout_keep_prob = dropout_keep_prob

    @property
    def labels_key(self) -> str:
        return f"{self.name}.labels"

    @property
    def mask_key(self) -> str:
        return f"{self.name}.labels_mask"

    def param_partition_specs(self) -> Dict[str, tuple]:
        return {"logit/w": (None, "model"), "logit/b": ("model",)}

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {}
        dim = self.encoder.state_dim
        if self.hidden_dim:
            k1, k2 = jax.random.split(rng)
            params["hidden"] = nn.linear_init(k1, dim, self.hidden_dim)
            params["logit"] = nn.linear_init(
                k2, self.hidden_dim, len(self.vocabulary))
        else:
            params["logit"] = nn.linear_init(
                rng, dim, len(self.vocabulary))
        return params

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        ids, mask = self.vocabulary.sentences_to_tensor(
            dataset.get_series(self.data_id), train_mode=train)
        return {self.labels_key: ids, self.mask_key: mask}

    # ------------------------------------------------------------------ #
    @tensor
    def logits(self, ctx: Context):
        params = ctx.get_params(self)
        states = self.encoder.temporal_states(ctx)
        states = ctx.dropout(self, states, self.dropout_keep_prob,
                             "state_dropout")
        if self.hidden_dim:
            states = self.activation(
                nn.linear(params["hidden"], states))
        return nn.linear(params["logit"], states)

    @tensor
    def train_loss(self, ctx: Context):
        logits = self.logits(ctx)
        labels = ctx.batch[self.labels_key]
        mask = ctx.batch[self.mask_key]
        time = min(logits.shape[1], labels.shape[1])
        log_probs = jax.nn.log_softmax(logits[:, :time], axis=-1)
        nll = -jnp.take_along_axis(
            log_probs, labels[:, :time][..., None], axis=-1)[..., 0]
        nll = nll * mask[:, :time]
        return jnp.sum(nll) / jnp.maximum(jnp.sum(mask[:, :time]), 1.0)

    def cost(self, ctx: Context):
        return self.train_loss(ctx)

    runtime_loss = train_loss

    @tensor
    def decoded(self, ctx: Context):
        return jnp.argmax(self.logits(ctx), axis=-1)

    @tensor
    def input_mask(self, ctx: Context):
        return self.encoder.temporal_mask(ctx)
