"""Scaled dot-product attention (reference
nm/attention/scaled_dot_product.py): the Luong-style decoder attention.
Multi-head attention for the Transformer lives in ops/attention.py; this
class is the per-step RNN-decoder interface."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...ops import nn
from .base_attention import (AttentionConstants, BaseAttention,
                             get_attention_mask, get_attention_states,
                             masked_softmax)


class ScaledDotProdAttention(BaseAttention):

    def __init__(self, name: str,
                 keys_encoder,
                 values_encoder=None,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, reuse, save_checkpoint, load_checkpoint)
        self.keys_encoder = keys_encoder
        self.values_encoder = (values_encoder if values_encoder is not None
                               else keys_encoder)
        self.dropout_keep_prob = dropout_keep_prob

    # accept `encoder=` as alias (some configs use it)
    @property
    def encoder(self):
        return self.keys_encoder

    @property
    def context_dim(self) -> int:
        return self.values_encoder.state_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.query_dim is None:
            raise ValueError(
                f"Attention '{self.name}' has no registered query dim")
        key_dim = self.keys_encoder.state_dim
        if self.query_dim == key_dim:
            return {}
        return {"query_proj": nn.linear_init(
            rng, self.query_dim, key_dim, use_bias=False)}

    @tensor
    def precompute(self, ctx: Context) -> AttentionConstants:
        keys = get_attention_states(ctx, self.keys_encoder)
        values = get_attention_states(ctx, self.values_encoder)
        mask = get_attention_mask(ctx, self.keys_encoder)
        return AttentionConstants(states=values, keys=keys, mask=mask)

    def _project(self, params, query):
        if "query_proj" in params:
            query = nn.linear(params["query_proj"], query)
        return query

    def step(self, params, constants: AttentionConstants, query):
        query = self._project(params, query)
        scale = 1.0 / jnp.sqrt(query.shape[-1]).astype(query.dtype)
        energies = jnp.einsum(
            "bk,btk->bt", query, constants.keys) * scale
        weights = masked_softmax(energies, constants.mask)
        context = jnp.einsum("bt,btd->bd", weights, constants.states)
        return context, weights

    beam_shared_constants = True

    def step_beamed(self, params, constants: AttentionConstants,
                    query, beam: int):
        """Beam step over one shared copy of keys/values (see
        base_attention.step_beamed)."""
        rows = query.shape[0]
        batch = rows // beam
        query = self._project(params, query)
        q = query.reshape(batch, beam, query.shape[-1])
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
        energies = jnp.einsum("bkd,btd->bkt", q, constants.keys) * scale
        weights = masked_softmax(energies, constants.mask[:, None, :])
        context = jnp.einsum("bkt,btd->bkd", weights, constants.states)
        return (context.reshape(rows, context.shape[-1]),
                weights.reshape(rows, weights.shape[-1]))

    def attend_sequence(self, params: Any, constants: Any, queries: Any):
        queries = self._project(params, queries)
        scale = 1.0 / jnp.sqrt(queries.shape[-1]).astype(queries.dtype)
        energies = jnp.einsum(
            "bqk,btk->bqt", queries, constants.keys) * scale
        weights = masked_softmax(energies, constants.mask[:, None, :])
        contexts = jnp.einsum("bqt,btd->bqd", weights, constants.states)
        return contexts, weights
