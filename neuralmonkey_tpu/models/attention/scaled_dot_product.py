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

    def _drop_weights(self, weights, dropout_rng):
        """Reference parity (nm/attention/scaled_dot_product.py
        `dropout_callback`): scaled dot-product attention drops out
        the SOFTMAX WEIGHTS in train mode (inverted dropout, no
        renormalization — the context is computed from the dropped
        weights). Engaged only when the decoder's train scan threads
        a per-step rng in; inference passes None."""
        if dropout_rng is None or self.dropout_keep_prob >= 1.0:
            return weights
        from ...ops.nn import dropout
        return dropout(weights, self.dropout_keep_prob, dropout_rng,
                       True)

    def step(self, params, constants: AttentionConstants, query,
             dropout_rng=None):
        query = self._project(params, query)
        scale = 1.0 / jnp.sqrt(query.shape[-1]).astype(query.dtype)
        energies = jnp.einsum(
            "bk,btk->bt", query, constants.keys) * scale
        weights = masked_softmax(energies, constants.mask)
        dropped = self._drop_weights(weights, dropout_rng)
        context = jnp.einsum("bt,btd->bd", dropped, constants.states)
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


class MultiHeadAttention(ScaledDotProdAttention):
    """Multi-head decoder attention (reference
    nm/attention/scaled_dot_product.py MultiHeadAttention): query,
    keys and values are linearly projected into ``n_heads`` subspaces,
    attended independently, concatenated and output-projected.

    Keys and values are projected ONCE per trace (in ``precompute``),
    so the per-decode-step work is one query projection + batched
    per-head dots — MXU-friendly einsums over a (B, h, T) energy
    block, no per-head Python loop."""

    def __init__(self, name: str,
                 n_heads: int,
                 keys_encoder,
                 values_encoder=None,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, keys_encoder, values_encoder,
                         dropout_keep_prob, reuse, save_checkpoint,
                         load_checkpoint)
        if n_heads < 1:
            raise ValueError("n_heads must be >= 1")
        self.n_heads = n_heads

    @property
    def _model_dim(self) -> int:
        dim = self.keys_encoder.state_dim
        if dim % self.n_heads != 0:
            raise ValueError(
                f"Attention '{self.name}': key dim {dim} not divisible "
                f"by n_heads={self.n_heads}")
        return dim

    @property
    def context_dim(self) -> int:
        return self._model_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.query_dim is None:
            raise ValueError(
                f"Attention '{self.name}' has no registered query dim")
        dim = self._model_dim
        rngs = jax.random.split(rng, 4)
        return {
            "query_proj": nn.linear_init(
                rngs[0], self.query_dim, dim, use_bias=False),
            "keys_proj": nn.linear_init(
                rngs[1], self.keys_encoder.state_dim, dim,
                use_bias=False),
            "values_proj": nn.linear_init(
                rngs[2], self.values_encoder.state_dim, dim,
                use_bias=False),
            "out_proj": nn.linear_init(rngs[3], dim, dim),
        }

    @tensor
    def precompute(self, ctx: Context) -> AttentionConstants:
        params = ctx.get_params(self)
        keys = get_attention_states(ctx, self.keys_encoder)
        values = get_attention_states(ctx, self.values_encoder)
        mask = get_attention_mask(ctx, self.keys_encoder)
        return AttentionConstants(
            states=nn.linear(params["values_proj"], values),
            keys=nn.linear(params["keys_proj"], keys),
            mask=mask)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., T, d) -> (..., h, T, d/h)."""
        split = x.reshape(*x.shape[:-1], self.n_heads,
                          x.shape[-1] // self.n_heads)
        return jnp.moveaxis(split, -2, -3)

    def _mh_attend(self, params, constants: AttentionConstants,
                   queries: jnp.ndarray, dropout_rng=None):
        """queries: (B, Q, query_dim) against projected constants.
        Returns contexts (B, Q, d) and head-mean weights (B, Q, T).
        With ``dropout_rng`` (train), the per-head softmax weights are
        dropped before the value contraction (reference
        `dropout_callback`; returned weight histories stay undropped)."""
        q = self._heads(nn.linear(params["query_proj"], queries))
        k = self._heads(constants.keys)
        v = self._heads(constants.states)
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
        energies = jnp.einsum("bhqd,bhtd->bhqt", q, k) * scale
        weights = masked_softmax(
            energies, constants.mask[:, None, None, :])
        dropped = self._drop_weights(weights, dropout_rng)
        ctxs = jnp.einsum("bhqt,bhtd->bhqd", dropped, v)
        merged = jnp.moveaxis(ctxs, -3, -2).reshape(
            *queries.shape[:-1], -1)
        return (nn.linear(params["out_proj"], merged),
                jnp.mean(weights, axis=1))

    def step(self, params, constants: AttentionConstants, query,
             dropout_rng=None):
        context, weights = self._mh_attend(
            params, constants, query[:, None, :],
            dropout_rng=dropout_rng)
        return context[:, 0], weights[:, 0]

    def step_beamed(self, params, constants: AttentionConstants,
                    query, beam: int):
        rows = query.shape[0]
        batch = rows // beam
        q = query.reshape(batch, beam, query.shape[-1])
        context, weights = self._mh_attend(params, constants, q)
        return (context.reshape(rows, context.shape[-1]),
                weights.reshape(rows, weights.shape[-1]))

    def attend_sequence(self, params: Any, constants: Any, queries: Any):
        return self._mh_attend(params, constants, queries)
