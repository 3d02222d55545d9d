"""Attention base (reference nm/attention/base_attention.py).

Design for the TPU decode loop: an attention object splits into

- ``precompute(ctx) -> constants``: everything derivable from the
  attended encoder once per sentence (states, mask, projected keys) —
  computed outside the decoder's ``lax.scan``/``while_loop`` and passed
  in as loop constants, so the per-step work is one small matmul +
  masked softmax instead of re-projecting the whole encoder every step;
- ``step(params, constants, query) -> (context, weights)``: a pure
  function usable inside scans (no Context access).

Spatial (conv-map) inputs are flattened to a T=H·W temporal view, as in
the reference's dispatch on Temporal vs Spatial statefulness.

The query dimension is registered by the decoder at construction time
(``register_query_dim``) — the rebuild's static replacement for the
reference's lazy @tensor shape discovery (SURVEY.md §8.3 item 4).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import SpatialStateful, TemporalStateful


class AttentionConstants(NamedTuple):
    """Per-sentence loop constants for one attention object."""
    states: jnp.ndarray   # (B, T, d) attended values
    keys: jnp.ndarray     # (B, T, k) projected keys (may alias states)
    mask: jnp.ndarray     # (B, T)


def get_attention_states(ctx: Context, encoder) -> jnp.ndarray:
    if isinstance(encoder, TemporalStateful):
        return encoder.temporal_states(ctx)
    if isinstance(encoder, SpatialStateful):
        spatial = encoder.spatial_states(ctx)
        b, h, w, d = spatial.shape
        return spatial.reshape(b, h * w, d)
    raise TypeError(
        f"Cannot attend over {encoder!r}: not Temporal/SpatialStateful")


def get_attention_mask(ctx: Context, encoder) -> jnp.ndarray:
    if isinstance(encoder, TemporalStateful):
        return encoder.temporal_mask(ctx)
    if isinstance(encoder, SpatialStateful):
        mask = encoder.spatial_mask(ctx)
        b = mask.shape[0]
        return mask.reshape(b, -1)
    raise TypeError(
        f"Cannot attend over {encoder!r}: not Temporal/SpatialStateful")


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis, ignoring masked-out positions."""
    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(mask > 0, scores, neg)
    weights = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    weights = weights * (mask > 0)
    total = jnp.sum(weights, axis=-1, keepdims=True)
    return weights / jnp.maximum(total, 1e-9)


class BaseAttention(ModelPart):

    def __init__(self, name: str,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.query_dim: int = None

    def register_query_dim(self, query_dim: int) -> None:
        """Called by the consuming decoder during construction."""
        if self.query_dim is not None and self.query_dim != query_dim:
            raise ValueError(
                f"Attention '{self.name}' already registered with query "
                f"dim {self.query_dim}, got {query_dim}")
        self.query_dim = query_dim

    @property
    def context_dim(self) -> int:
        """Dimension of the produced context vector."""
        raise NotImplementedError

    def precompute(self, ctx: Context) -> AttentionConstants:
        raise NotImplementedError

    def tile_constants(self, constants, k: int):
        """Repeat batch-dimensioned constants k× (beam search)."""
        import jax
        return jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, k, axis=0), constants)

    # Attentions whose constants are beam-invariant (the encoder keys/
    # values/mask never depend on the hypothesis) can serve all K beams
    # from ONE copy: lineage beam decoding then reads them once per
    # step instead of K times — they were the dominant per-step HBM
    # traffic of the RNN beam decode. Opt in by setting
    # ``beam_shared_constants = True`` and implementing ``step_beamed``.
    beam_shared_constants = False

    def tile_constants_lineage(self, constants, k: int):
        """Constants preparation for lineage beam decoding: shared
        (untiled) when this attention implements ``step_beamed``,
        otherwise the plain per-beam tiling."""
        if self.beam_shared_constants:
            return constants
        return self.tile_constants(constants, k)

    def step_beamed(self, params: Dict[str, Any],
                    constants: AttentionConstants,
                    query: jnp.ndarray, beam: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One step over UNtiled constants: ``query`` has B·beam rows,
        the constants batch B. Returns flat (B·beam, ...) outputs like
        ``step``. Only ``beam_shared_constants = True`` attentions
        implement this."""
        raise NotImplementedError

    def step(self, params: Dict[str, Any],
             constants: AttentionConstants,
             query: jnp.ndarray,
             dropout_rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(context (B, d), weights (B, T)) for one decoder step.

        ``dropout_rng`` is a per-step key the decoder's teacher-forced
        scan threads in when training with ``dropout_keep_prob < 1``;
        attention classes whose reference semantics drop the softmax
        weights (scaled dot-product) use it, others ignore it.
        Inference passes None."""
        raise NotImplementedError

    def attend_sequence(self, params, constants,
                        queries: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Vectorized attention over a whole query sequence (B, Tq, q) —
        used by teacher-forced training where all queries exist at once.
        Default: defer to `step` semantics batched over time."""
        import jax
        contexts, weights = jax.vmap(
            lambda q: self.step(params, constants, q),
            in_axes=1, out_axes=1)(queries)
        return contexts, weights
