"""Bahdanau (MLP-energy) attention (reference nm/attention/feed_forward.py).

Energies ``e_i = v · tanh(W_q s + W_k h_i + b)``; masked softmax;
context = Σ a_i h_i. The key projection ``W_k h_i`` is hoisted into
``precompute`` so the decode loop's per-step cost is one (B,q)x(q,a)
matmul, a (B,T,a) add + tanh, and a (B,T,a)x(a,) reduction — all fusable
by XLA into a single VMEM-resident kernel per step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...ops import nn
from .base_attention import (AttentionConstants, BaseAttention,
                             get_attention_mask, get_attention_states,
                             masked_softmax)


class Attention(BaseAttention):

    def __init__(self, name: str,
                 encoder,
                 dropout_keep_prob: float = 1.0,
                 state_size: int = None,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, reuse, save_checkpoint, load_checkpoint)
        self.encoder = encoder
        self.dropout_keep_prob = dropout_keep_prob
        # attention_state_size: hidden size of the energy MLP
        self.state_size = state_size if state_size is not None else \
            getattr(encoder, "output_dim", None) or encoder.state_dim

    @property
    def context_dim(self) -> int:
        return self.encoder.state_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.query_dim is None:
            raise ValueError(
                f"Attention '{self.name}' has no registered query dim "
                "(is it attached to a decoder?)")
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "key_proj": nn.linear_init(k1, self.encoder.state_dim,
                                       self.state_size, use_bias=True),
            "query_proj": nn.linear_init(k2, self.query_dim,
                                         self.state_size, use_bias=False),
            "similarity_v": (jax.random.normal(k3, (self.state_size,))
                             * (1.0 / jnp.sqrt(self.state_size))),
        }

    @tensor
    def precompute(self, ctx: Context) -> AttentionConstants:
        states = get_attention_states(ctx, self.encoder)
        # reference parity (nm/attention/feed_forward.py
        # `attention_states_dropped`): Bahdanau attention drops out
        # the ATTENDED STATES in train mode — both the key projection
        # and the returned context see the dropped states. Per-trace
        # (ctx.dropout is train-gated, identity at inference).
        states = ctx.dropout(self, states, self.dropout_keep_prob,
                             "attention_states_dropout")
        mask = get_attention_mask(ctx, self.encoder)
        params = ctx.get_params(self)
        keys = nn.linear(params["key_proj"], states)  # (B, T, a)
        return AttentionConstants(states=states, keys=keys, mask=mask)

    def step(self, params, constants: AttentionConstants, query,
             dropout_rng=None):
        # dropout_rng unused: this class's reference dropout site is
        # the states (precompute above), not the softmax weights
        projected_query = nn.linear(params["query_proj"], query)
        from ...ops.kernel_config import use_pallas
        if use_pallas():
            # mesh-aware: shard_map-wrapped per data shard on
            # multi-device data(/model) meshes (kernel_config.note_mesh)
            from ...ops.pallas_attention import bahdanau_step_dispatch
            return bahdanau_step_dispatch(
                constants.keys, constants.states, constants.mask,
                projected_query, params["similarity_v"])
        energies = jnp.einsum(
            "bta,a->bt",
            jnp.tanh(constants.keys + projected_query[:, None, :]),
            params["similarity_v"])
        weights = masked_softmax(energies, constants.mask)
        context = jnp.einsum("bt,btd->bd", weights, constants.states)
        return context, weights

    beam_shared_constants = True

    def step_beamed(self, params, constants: AttentionConstants,
                    query, beam: int):
        """Beam step over ONE shared copy of keys/states: the beam axis
        folds into the query and the precomputed key projections
        broadcast — per-step constant reads drop by the beam factor
        (the dominant HBM traffic of the RNN beam decode)."""
        rows = query.shape[0]
        batch = rows // beam
        pq = nn.linear(params["query_proj"], query)
        pq = pq.reshape(batch, beam, 1, pq.shape[-1])
        energies = jnp.einsum(
            "bkta,a->bkt",
            jnp.tanh(constants.keys[:, None, :, :] + pq),
            params["similarity_v"])
        weights = masked_softmax(energies, constants.mask[:, None, :])
        context = jnp.einsum("bkt,btd->bkd", weights, constants.states)
        return (context.reshape(rows, context.shape[-1]),
                weights.reshape(rows, weights.shape[-1]))

    def attend_sequence(self, params: Any, constants: Any, queries: Any):
        """All-steps-at-once variant for teacher forcing: queries
        (B, Tq, q) -> contexts (B, Tq, d), weights (B, Tq, T)."""
        projected = nn.linear(params["query_proj"], queries)  # (B,Tq,a)
        energies = jnp.einsum(
            "btqa,a->btq",
            jnp.tanh(constants.keys[:, None, :, :]
                     + projected[:, :, None, :]),
            params["similarity_v"])  # (B, Tq, T)
        weights = masked_softmax(energies, constants.mask[:, None, :])
        contexts = jnp.einsum("btq,bqd->btd", weights, constants.states)
        return contexts, weights


class CoverageAttention(Attention):
    """Coverage attention (reference nm/attention/coverage.py; Tu et al.
    2016): the energy additionally sees the accumulated attention mass
    per source position. Stateful across decoder steps — the decoder
    threads the coverage vector through its loop state via
    ``step_with_coverage``."""

    def __init__(self, name: str,
                 encoder,
                 dropout_keep_prob: float = 1.0,
                 state_size: int = None,
                 max_fertility: int = 5,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, encoder, dropout_keep_prob, state_size,
                         reuse, save_checkpoint, load_checkpoint)
        self.max_fertility = max_fertility

    @property
    def stateful_attention(self) -> bool:
        return True

    # the coverage step threads per-beam state through tiled
    # constants; keep the plain tiling under lineage decoding
    beam_shared_constants = False

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init_params(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        params["coverage_proj"] = (
            jax.random.normal(k1, (1, self.state_size)) * 0.001)
        params["fertility_proj"] = nn.linear_init(
            k2, self.encoder.state_dim, 1, use_bias=True)
        return params

    def step_with_coverage(self, params: Any, constants: Any,
                           query: Any, coverage: Any):
        """coverage: (B, T) accumulated weights. Returns
        (context, weights, new_coverage)."""
        fertility = self.max_fertility * jax.nn.sigmoid(
            nn.linear(params["fertility_proj"], constants.states)[..., 0])
        cov_feature = (coverage / jnp.maximum(fertility, 1e-6))[..., None]
        cov_term = cov_feature * params["coverage_proj"]  # (B, T, a)
        projected_query = nn.linear(params["query_proj"], query)[:, None, :]
        energies = jnp.einsum(
            "bta,a->bt",
            jnp.tanh(constants.keys + projected_query + cov_term),
            params["similarity_v"])
        weights = masked_softmax(energies, constants.mask)
        context = jnp.einsum("bt,btd->bd", weights, constants.states)
        return context, weights, coverage + weights

    def step(self, params: Any, constants: Any, query: Any,
             dropout_rng=None):
        # Fallback without state (coverage = 0); decoders that know about
        # stateful attentions call step_with_coverage instead.
        # dropout_rng unused (states-dropout happens in precompute).
        context, weights, _ = self.step_with_coverage(
            params, constants, query,
            jnp.zeros_like(constants.mask))
        return context, weights
