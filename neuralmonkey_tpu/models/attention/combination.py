"""Multi-source attention combinators
(reference nm/attention/combination.py; Libovický & Helcl 2017) — the
key component of multimodal MT (SURVEY.md §3.1).

- :class:`FlatMultiAttention`: every encoder's states are projected to
  one shared attention space; a single softmax runs over the
  concatenation of all positions of all encoders.
- :class:`HierarchicalMultiAttention`: child attentions produce one
  context each; a second-level Bahdanau-style attention weighs the
  (projected) child contexts.

Both accept Temporal and Spatial encoders (spatial maps flattened), so
a text encoder and an image CNN combine freely — pure config, as in the
reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...ops import nn
from .base_attention import (AttentionConstants, BaseAttention,
                             get_attention_mask, get_attention_states,
                             masked_softmax)


class FlatMultiAttention(BaseAttention):

    def __init__(self, name: str,
                 encoders: List,
                 attention_state_size: int,
                 share_attn_projections: bool = False,
                 use_sentinels: bool = False,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, reuse, save_checkpoint, load_checkpoint)
        if not encoders:
            raise ValueError("FlatMultiAttention needs encoders")
        self.encoders = encoders
        self.attention_state_size = attention_state_size
        self.share_attn_projections = share_attn_projections
        self.use_sentinels = use_sentinels
        self.dropout_keep_prob = dropout_keep_prob

    @property
    def context_dim(self) -> int:
        return self.attention_state_size

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.query_dim is None:
            raise ValueError(
                f"Attention '{self.name}' has no registered query dim")
        keys = jax.random.split(rng, len(self.encoders) + 2)
        params: Dict[str, Any] = {
            "query_proj": nn.linear_init(
                keys[0], self.query_dim, self.attention_state_size,
                use_bias=False),
            "similarity_v": (
                jax.random.normal(keys[1],
                                  (self.attention_state_size,))
                * (1.0 / jnp.sqrt(self.attention_state_size))),
        }
        if self.share_attn_projections:
            dims = {e.state_dim for e in self.encoders}
            if len(dims) != 1:
                raise ValueError(
                    "share_attn_projections requires encoders with "
                    "equal state dims")
            params["enc_proj_0"] = nn.linear_init(
                keys[2], dims.pop(), self.attention_state_size)
        else:
            for i, encoder in enumerate(self.encoders):
                params[f"enc_proj_{i}"] = nn.linear_init(
                    keys[2 + i], encoder.state_dim,
                    self.attention_state_size)
        return params

    def _proj_key(self, i: int) -> str:
        return "enc_proj_0" if self.share_attn_projections \
            else f"enc_proj_{i}"

    @tensor
    def precompute(self, ctx: Context) -> AttentionConstants:
        params = ctx.get_params(self)
        projected = []
        masks = []
        for i, encoder in enumerate(self.encoders):
            states = get_attention_states(ctx, encoder)
            projected.append(
                nn.linear(params[self._proj_key(i)], states))
            masks.append(get_attention_mask(ctx, encoder))
        states_cat = jnp.concatenate(projected, axis=1)
        mask_cat = jnp.concatenate(masks, axis=1)
        # keys == projected states (energies add the projected query)
        return AttentionConstants(states=states_cat, keys=states_cat,
                                  mask=mask_cat)

    def step(self, params, constants: AttentionConstants, query,
             dropout_rng=None):
        # dropout_rng accepted for interface uniformity; the reference
        # flat multi-attention has no weights-dropout site
        projected_query = nn.linear(
            params["query_proj"], query)[:, None, :]
        energies = jnp.einsum(
            "bta,a->bt",
            jnp.tanh(constants.keys + projected_query),
            params["similarity_v"])
        weights = masked_softmax(energies, constants.mask)
        context = jnp.einsum("bt,btd->bd", weights, constants.states)
        return context, weights


class HierarchicalConstants(NamedTuple):
    children: Tuple  # per-child AttentionConstants


class HierarchicalMultiAttention(BaseAttention):

    def __init__(self, name: str,
                 attentions: List[BaseAttention],
                 attention_state_size: int,
                 share_attn_projections: bool = False,
                 use_sentinels: bool = False,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(name, reuse, save_checkpoint, load_checkpoint)
        if not attentions:
            raise ValueError(
                "HierarchicalMultiAttention needs child attentions")
        self.attentions = attentions
        self.attention_state_size = attention_state_size
        self.share_attn_projections = share_attn_projections
        self.use_sentinels = use_sentinels
        self.dropout_keep_prob = dropout_keep_prob

    @property
    def context_dim(self) -> int:
        return self.attention_state_size

    def register_query_dim(self, query_dim: int) -> None:
        super().register_query_dim(query_dim)
        for child in self.attentions:
            child.register_query_dim(query_dim)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.query_dim is None:
            raise ValueError(
                f"Attention '{self.name}' has no registered query dim")
        keys = jax.random.split(rng, len(self.attentions) + 2)
        params: Dict[str, Any] = {
            "query_proj": nn.linear_init(
                keys[0], self.query_dim, self.attention_state_size,
                use_bias=False),
            "similarity_v": (
                jax.random.normal(keys[1],
                                  (self.attention_state_size,))
                * (1.0 / jnp.sqrt(self.attention_state_size))),
        }
        if self.share_attn_projections:
            dims = {a.context_dim for a in self.attentions}
            if len(dims) != 1:
                raise ValueError(
                    "share_attn_projections requires children with "
                    "equal context dims")
            params["ctx_proj_0"] = nn.linear_init(
                keys[2], dims.pop(), self.attention_state_size)
        else:
            for i, child in enumerate(self.attentions):
                params[f"ctx_proj_{i}"] = nn.linear_init(
                    keys[2 + i], child.context_dim,
                    self.attention_state_size)
        return params

    def _proj_key(self, i: int) -> str:
        return "ctx_proj_0" if self.share_attn_projections \
            else f"ctx_proj_{i}"

    @tensor
    def precompute(self, ctx: Context):
        children = tuple(child.precompute(ctx)
                         for child in self.attentions)
        # bundle the children's params so `step` stays pure
        child_params = tuple(ctx.get_params(child)
                             for child in self.attentions)
        return {"children": children, "child_params": child_params}

    def tile_constants(self, constants, k: int):
        """Tile children's batch constants; child params broadcast."""
        return {
            "children": tuple(
                child.tile_constants(c, k)
                for child, c in zip(self.attentions,
                                    constants["children"])),
            "child_params": constants["child_params"],
        }

    def step(self, params: Any, constants: Any, query: Any,
             dropout_rng=None):
        child_contexts = []
        child_weights = []
        for i, child in enumerate(self.attentions):
            context, weights = child.step(
                constants["child_params"][i],
                constants["children"][i], query,
                dropout_rng=dropout_rng)
            child_contexts.append(context)
            child_weights.append(weights)

        projected = jnp.stack(
            [nn.linear(params[self._proj_key(i)], c)
             for i, c in enumerate(child_contexts)],
            axis=1)  # (B, n_children, a)
        projected_query = nn.linear(
            params["query_proj"], query)[:, None, :]
        energies = jnp.einsum(
            "bna,a->bn", jnp.tanh(projected + projected_query),
            params["similarity_v"])
        n = len(self.attentions)
        ones = jnp.ones(energies.shape, energies.dtype)
        beta = masked_softmax(energies, ones)
        context = jnp.einsum("bn,bna->ba", beta, projected)
        # expose child weights concatenated for visualization
        weights = jnp.concatenate(child_weights, axis=-1)
        return context, weights
