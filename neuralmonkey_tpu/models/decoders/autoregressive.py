"""Autoregressive decoder base (reference nm/decoders/autoregressive.py).

Shared machinery for RNN and Transformer decoders: target featurization
(teacher inputs = ``<s> w1..wn``, targets = ``w1..wn </s>``), masked
cross-entropy with optional label smoothing, and the greedy decode loop.

TPU-native decisions:
- teacher-forced and greedy paths are jitted functions over *static*
  max lengths (bucketed batches keep the shape set finite);
- the greedy loop is a ``lax.scan`` on device — no per-step host
  round-trips (the reference's per-step session.run, SURVEY.md §4.4);
- beam search lives in decoders/beam_search_decoder.py and reuses the
  subclass step API defined here.

Subclass contract (used by greedy and beam search):
- ``decode_constants(ctx)`` -> pytree of per-sentence constants
  (attention keys, embedding tables, parameters…);
- ``decode_initial_state(ctx, constants)`` -> loop-state pytree;
- ``decode_step(constants, loop_state, prev_ids, step)`` ->
  ``(new_loop_state, logits (B, V), aux dict)`` — pure, scan-safe.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.sequence import EmbeddedSequence
from ...vocabulary import (END_TOKEN_INDEX, PAD_TOKEN_INDEX,
                           START_TOKEN_INDEX, UNK_TOKEN_INDEX, Vocabulary)


class AutoregressiveDecoder(ModelPart):

    def __init__(self, name: str,
                 vocabulary: Vocabulary,
                 data_id: str,
                 max_output_len: int,
                 dropout_keep_prob: float = 1.0,
                 embedding_size: int = None,
                 embeddings_source: EmbeddedSequence = None,
                 tie_embeddings: bool = False,
                 label_smoothing: float = None,
                 supress_unk: bool = False,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.vocabulary = vocabulary
        self.data_id = data_id
        self.max_output_len = max_output_len
        self.dropout_keep_prob = dropout_keep_prob
        self.label_smoothing = label_smoothing
        self.tie_embeddings = tie_embeddings
        self.supress_unk = supress_unk

        if embeddings_source is not None:
            self.embeddings = embeddings_source
            self.embedding_size = embeddings_source.embedding_size
            if (embedding_size is not None
                    and embedding_size != self.embedding_size):
                raise ValueError(
                    "embedding_size conflicts with embeddings_source")
        else:
            if embedding_size is None:
                raise ValueError(
                    "Provide embedding_size or embeddings_source")
            self.embedding_size = embedding_size
            self.embeddings = EmbeddedSequence(
                name=f"{name}_embeddings",
                vocabulary=vocabulary,
                data_id=data_id,
                embedding_size=embedding_size,
                table_only=True)

        if max_output_len <= 0:
            raise ValueError("max_output_len must be positive")

    # ------------------------------------------------------------------ #
    # featurization: train inputs/targets from the target series
    # ------------------------------------------------------------------ #
    @property
    def input_ids_key(self) -> str:
        return f"{self.name}.train_inputs"

    @property
    def target_ids_key(self) -> str:
        return f"{self.name}.train_targets"

    @property
    def target_mask_key(self) -> str:
        return f"{self.name}.train_mask"

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}  # inference dataset without targets
        sentences = dataset.get_series(self.data_id)
        full, mask = self.vocabulary.sentences_to_tensor(
            sentences, max_len=self.max_output_len, train_mode=train,
            add_start_symbol=True, add_end_symbol=True)
        return {
            self.input_ids_key: full[:, :-1],
            self.target_ids_key: full[:, 1:],
            self.target_mask_key: mask[:, 1:],
        }

    @tensor
    def train_inputs(self, ctx: Context):
        return ctx.batch[self.input_ids_key]

    @tensor
    def train_targets(self, ctx: Context):
        return ctx.batch[self.target_ids_key]

    @tensor
    def train_mask(self, ctx: Context):
        return ctx.batch[self.target_mask_key]

    # ------------------------------------------------------------------ #
    # subclass contract
    # ------------------------------------------------------------------ #
    def train_logits(self, ctx: Context):
        """(B, T, V) teacher-forced logits."""
        raise NotImplementedError

    def param_partition_specs(self) -> Dict[str, tuple]:
        # vocab-sized output projection shards its columns over the
        # model axis (tied-embedding layouts have no "logit" subtree —
        # the embedding table's own declaration covers them)
        return {"logit/w": (None, "model"),
                "logit/b": ("model",),
                "logit_bias": ("model",)}

    def decode_constants(self, ctx: Context):
        raise NotImplementedError

    def decode_initial_state(self, ctx: Context, constants):
        raise NotImplementedError

    def decode_step(self, constants: Any, loop_state: Any,
                    prev_ids: jnp.ndarray, step: Any):
        raise NotImplementedError

    # True when decode_step's aux carries "attention_weights" (beam
    # search records per-step histories for attention visualization
    # only when the parent declares it)
    emits_attention = False

    # Decoders whose per-beam loop state is dominated by position-
    # indexed caches (transformer KV) may support *lineage decoding*:
    # beam search then never physically reorders the loop state by
    # parent indices (the dominant HBM cost of incremental decode —
    # a gather+rewrite of every cache per step). Instead the search
    # carries a (B, K, T) ancestry matrix and the decoder resolves it
    # in score space (see TransformerDecoder.decode_step_lineage).
    lineage_decode = False

    def decode_step_lineage(self, constants: Any, loop_state: Any,
                            prev_ids: jnp.ndarray, step: Any,
                            anc: jnp.ndarray, beam: int,
                            window: int = None):
        """`decode_step` variant for lineage decoding: loop_state rows
        stay owned by the beam slot that wrote them; ``anc[b, k, t]``
        names the slot whose row at position t belongs to beam k's
        hypothesis. ``window`` is a STATIC bound > step: positions at
        or beyond it are known-invalid, so position-indexed caches may
        be read only up to it (the search runs segmented loops with
        growing windows to cut early-step cache traffic). Only
        decoders with ``lineage_decode = True`` implement this."""
        raise NotImplementedError

    def tile_decode_constants_lineage(self, constants, k: int):
        """Constants preparation for lineage decoding. Defaults to the
        plain beam tiling; lineage-capable decoders override it to
        keep beam-invariant constants (e.g. encoder K/V) untiled —
        ``decode_step_lineage`` receives the beam factor and shares
        them across beams, cutting their per-step HBM reads by K."""
        return self.tile_decode_constants(constants, k)

    def prepare_selection_fusion(self, constants: Any) -> Any:
        """Arm decode constants with a lane-aligned (D, Vp) logit
        matrix + (1, Vp) bias under the ``"fused_logit"`` key, so the
        decode steps emit logits AND the hierarchical beam selector's
        two reductions from ONE fused kernel epilogue
        (ops/beam_select.fused_logits_rowmax_lse) — the (N, Vp) logits
        matrix is written once and never re-read from HBM (the
        separate reduction pass costs ~77 MB/step at the bench's
        beam-10 shape). Pad columns carry bias −1e9 like
        ``align_logits_for_selection``. Returns constants unchanged
        when the backend keeps kernels off or the constants do not
        follow the params/embed_table layout (the unfused path then
        runs exactly as before). Called by BeamSearchDecoder for
        single-model hierarchical selection only."""
        from ...ops.kernel_config import use_fused_logits
        if not use_fused_logits() or "params" not in constants:
            return constants
        params = constants["params"]
        if getattr(self, "tie_embeddings", False):
            if "logit_bias" not in params or \
                    "embed_table" not in constants:
                return constants
            w = constants["embed_table"].T
            b = params["logit_bias"]
        else:
            logit = params.get("logit")
            if not isinstance(logit, dict) or "w" not in logit:
                return constants
            w = logit["w"]
            b = logit.get("b")
            if b is None:
                b = jnp.zeros((w.shape[1],), jnp.float32)
        w = w.astype(jnp.float32)
        b = b.astype(jnp.float32)
        # pad to a multiple of 8·128: Vp/128 divisible by 8 lets the
        # kernel emit window-tiled (N, R, 128) logits whose stage-2
        # beam-selector view is a free bitcast (see
        # fused_logits_rowmax_lse logits_3d); the extra ≤2% matmul
        # columns are far cheaper than the ~1 ms/step relayout they
        # replace
        pad = (-w.shape[1]) % (8 * 128)
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
            b = jnp.concatenate(
                [b, jnp.full((pad,), -1e9, jnp.float32)])
        constants = dict(constants)
        constants["fused_logit"] = (w, b[None, :])
        return constants

    def _step_logits(self, constants: Any, prelogit: jnp.ndarray,
                     fallback):
        """Decode-step logit projection. When
        ``prepare_selection_fusion`` armed the constants, computes
        (logits, rowmax, lse) in one fused kernel and returns the
        reductions as aux entries the beam selector picks up;
        otherwise calls ``fallback()`` (the decoder's plain
        projection) and returns no aux."""
        fused = constants.get("fused_logit")
        if fused is None:
            return fallback(), {}
        from ...ops.beam_select import fused_logits_rowmax_lse
        w, b = fused
        import os
        vp = w.shape[1]
        n = prelogit.shape[0]
        # window-tiled (N, R, 128) logits pay per-group dots + a
        # smaller row tile in the kernel but spare the selector's
        # stage-2 HBM relayout; measured on v5e the relayout only
        # dominates once the logits matrix is large (beam 20 at
        # batch 64: 1143 vs 970 sent/s 3-D; beam 10: 1842 vs 2100 —
        # XLA fuses the small-matrix gather). Crossover ~100 MB,
        # calibrated at the v5e bench shapes (beam 10/20, batch 64);
        # other shapes may land on the slower layout. NOTE: this
        # branch runs at TRACE time — NM_LOGITS3D only takes effect
        # before the first trace of a given decode shape (the choice
        # is frozen into the cached jit program per shape).
        mode = os.environ.get("NM_LOGITS3D", "auto")
        if mode == "auto":
            want_3d = n * vp * 4 >= 100_000_000
        else:
            want_3d = mode != "0"
        want_3d = want_3d and vp % (8 * 128) == 0
        logits, rowmax, lse = fused_logits_rowmax_lse(
            prelogit.astype(jnp.float32), w, b, logits_3d=want_3d)
        aux = {"sel_rowmax": rowmax, "sel_lse": lse}
        if want_3d:
            # window-tiled logits for the selector's stage-2 gather;
            # the 2-D view below is dead under hierarchical selection
            # (XLA DCEs the relayout — the selector reads sel_logits3)
            aux["sel_logits3"] = logits
            logits = logits.reshape(logits.shape[0], vp)
        return logits, aux

    def align_logits_for_selection(self, constants: Any,
                                   lane: int = 128) -> Any:
        """Pad the logit projection inside decode constants so
        ``decode_step`` emits lane-aligned (V padded to a multiple of
        128) logits — the hierarchical beam selector then never pays a
        per-step pad pass. Extra columns carry bias −1e9, far below
        any real logit, so they are never selected (and the search
        clamps emitted ids defensively). No-op when already aligned or
        when the constants do not follow the params/embed_table
        layout."""
        vocab = len(self.vocabulary)
        pad = (-vocab) % lane
        if pad == 0 or "params" not in constants:
            return constants
        neg = -1e9
        constants = dict(constants)
        params = dict(constants["params"])
        if self.tie_embeddings:
            if "logit_bias" not in params or \
                    "embed_table" not in constants:
                return constants
            table = constants["embed_table"]
            constants["embed_table"] = jnp.pad(
                table, ((0, pad), (0, 0)))
            bias = params["logit_bias"]
            params["logit_bias"] = jnp.concatenate(
                [bias, jnp.full((pad,), neg, bias.dtype)])
        else:
            if "logit" not in params:
                return constants
            logit = dict(params["logit"])
            w = logit["w"]
            logit["w"] = jnp.pad(w, ((0, 0), (0, pad)))
            bias = logit.get("b")
            if bias is None:
                bias = jnp.zeros((vocab,), jnp.float32)
            logit["b"] = jnp.concatenate(
                [bias, jnp.full((pad,), neg, bias.dtype)])
            params["logit"] = logit
        constants["params"] = params
        return constants

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #
    def _xent(self, logits, targets, mask):
        """Per-token masked cross-entropy; returns (B, T)."""
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        vocab = logits.shape[-1]
        if self.label_smoothing:
            eps = self.label_smoothing
            target_ll = jnp.take_along_axis(
                log_probs, targets[..., None], axis=-1)[..., 0]
            uniform_ll = jnp.mean(log_probs, axis=-1)
            nll = -((1.0 - eps) * target_ll + eps * uniform_ll)
        else:
            nll = -jnp.take_along_axis(
                log_probs, targets[..., None], axis=-1)[..., 0]
        return nll * mask

    def _fused_token_nll(self, ctx: Context):
        """(B, T) per-token nll via the fused softmax-xent kernels
        (ops/fused_xent.py — the (B·T, V) logits never reach HBM), or
        ``None`` when this decoder has no prelogit seam or the shape/
        dtype/backend is ineligible (materialized-logits fallback)."""
        proj_fn = getattr(self, "train_logit_projection", None)
        states_fn = getattr(self, "train_prelogit_states", None)
        if proj_fn is None or states_fn is None:
            return None
        from ...ops import fused_xent
        states = states_fn(ctx)
        bsz, time, dim = states.shape
        w, b, transposed = proj_fn(ctx)
        if not fused_xent.eligible(bsz * time, dim, states.dtype,
                                   w.dtype):
            return None
        targets = self.train_targets(ctx).reshape(bsz * time)
        nll = fused_xent.fused_softmax_xent(
            states.reshape(bsz * time, dim), w, b, targets,
            eps=self.label_smoothing or 0.0, transposed=transposed)
        return nll.reshape(bsz, time)

    @tensor
    def train_token_nll(self, ctx: Context):
        """(B, T) masked per-token xent — fused tail when eligible."""
        mask = self.train_mask(ctx)
        fused = self._fused_token_nll(ctx)
        if fused is not None:
            return fused * mask
        return self._xent(self.train_logits(ctx),
                          self.train_targets(ctx), mask)

    @tensor
    def train_xents(self, ctx: Context):
        """Per-sentence summed xent (B,) — the perplexity runner's input."""
        return jnp.sum(self.train_token_nll(ctx), axis=1)

    @tensor
    def train_loss(self, ctx: Context):
        """Mean per-token xent (scalar) — the training objective."""
        nll = self.train_token_nll(ctx)
        mask = self.train_mask(ctx)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)

    # the reference's name for the decoder's objective value
    def cost(self, ctx: Context):
        return self.train_loss(ctx)

    @tensor
    def runtime_loss(self, ctx: Context):
        """Xent of the greedy path's logits against the reference —
        only defined when the batch carries targets."""
        logits, _, _ = self.greedy_outputs(ctx)
        targets = self.train_targets(ctx)
        mask = self.train_mask(ctx)
        time = min(logits.shape[1], targets.shape[1])
        nll = self._xent(logits[:, :time], targets[:, :time],
                         mask[:, :time])
        return jnp.sum(nll) / jnp.maximum(jnp.sum(mask[:, :time]), 1.0)

    # ------------------------------------------------------------------ #
    # greedy decoding (on-device scan)
    # ------------------------------------------------------------------ #
    def _mask_unk(self, logits):
        if not self.supress_unk:
            return logits
        neg = jnp.finfo(logits.dtype).min
        return logits.at[..., UNK_TOKEN_INDEX].set(neg)

    @tensor
    def greedy_outputs(self, ctx: Context
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
        """Returns (logits (B, L, V), decoded ids (B, L), aux pytree)."""
        constants = self.decode_constants(ctx)
        init_state = self.decode_initial_state(ctx, constants)
        batch = self._batch_size(ctx)
        start_ids = jnp.full((batch,), START_TOKEN_INDEX, jnp.int32)
        finished0 = jnp.zeros((batch,), bool)

        def body(carry, step):
            loop_state, prev_ids, finished = carry
            new_state, logits, aux = self.decode_step(
                constants, loop_state, prev_ids, step)
            logits = self._mask_unk(logits)
            new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # after a sentence finishes, emit padding
            new_ids = jnp.where(finished, PAD_TOKEN_INDEX, new_ids)
            new_finished = finished | (new_ids == END_TOKEN_INDEX)
            return ((new_state, new_ids, new_finished),
                    (logits, new_ids, aux))

        _, (logits, decoded, aux) = jax.lax.scan(
            body, (init_state, start_ids, finished0),
            jnp.arange(self.max_output_len))
        # scan stacks on axis 0 (time) -> move to (B, T, ...)
        logits = jnp.swapaxes(logits, 0, 1)
        decoded = jnp.swapaxes(decoded, 0, 1)
        return logits, decoded, aux

    @tensor
    def greedy_ids(self, ctx: Context) -> jnp.ndarray:
        """Lean greedy decode: ids only, early exit.

        Unlike :meth:`greedy_outputs` (a fixed-length ``lax.scan`` that
        stacks full (B, T, V) logits for runtime_loss / attention
        fetches), this is a ``lax.while_loop`` that (a) stops as soon
        as every sentence in the batch has emitted </s> — the win for
        online serving, where batch-1 sentences finish long before
        ``max_output_len`` — and (b) never materializes the logits
        stack (368 MB of HBM writes per batch-64 decode at a 30k
        vocab). Emits PAD after a sentence finishes, exactly like the
        scan path."""
        constants = self.decode_constants(ctx)
        init_state = self.decode_initial_state(ctx, constants)
        batch = self._batch_size(ctx)
        start_ids = jnp.full((batch,), START_TOKEN_INDEX, jnp.int32)
        finished0 = jnp.zeros((batch,), bool)
        buf0 = jnp.full((batch, self.max_output_len), PAD_TOKEN_INDEX,
                        jnp.int32)

        def cond(carry):
            step, _, _, finished, _ = carry
            return jnp.logical_and(step < self.max_output_len,
                                   ~jnp.all(finished))

        def body(carry):
            step, loop_state, prev_ids, finished, buf = carry
            new_state, logits, _ = self.decode_step(
                constants, loop_state, prev_ids, step)
            logits = self._mask_unk(logits)
            new_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            new_ids = jnp.where(finished, PAD_TOKEN_INDEX, new_ids)
            buf = buf.at[:, step].set(new_ids)
            new_finished = finished | (new_ids == END_TOKEN_INDEX)
            return (step + 1, new_state, new_ids, new_finished, buf)

        carry = (jnp.int32(0), init_state, start_ids, finished0, buf0)
        _, _, _, _, decoded = jax.lax.while_loop(cond, body, carry)
        return decoded

    @tensor
    def sample_outputs(self, ctx: Context
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ancestral sampling decode. Returns (sampled ids (B, L),
        summed log-probs of the sampled tokens (B,)) — the RL /
        self-critical training path (reference
        nm/trainers/self_critical_objective.py counterpart)."""
        constants = self.decode_constants(ctx)
        init_state = self.decode_initial_state(ctx, constants)
        batch = self._batch_size(ctx)
        start_ids = jnp.full((batch,), START_TOKEN_INDEX, jnp.int32)
        finished0 = jnp.zeros((batch,), bool)
        base_rng = ctx.make_rng(self, "sampling")

        def body(carry, step):
            loop_state, prev_ids, finished = carry
            new_state, logits, _ = self.decode_step(
                constants, loop_state, prev_ids, step)
            logits = self._mask_unk(logits)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            step_rng = jax.random.fold_in(base_rng, step)
            new_ids = jax.random.categorical(
                step_rng, logits).astype(jnp.int32)
            new_ids = jnp.where(finished, PAD_TOKEN_INDEX, new_ids)
            chosen_lp = jnp.take_along_axis(
                log_probs, new_ids[:, None], axis=-1)[:, 0]
            chosen_lp = jnp.where(finished, 0.0, chosen_lp)
            new_finished = finished | (new_ids == END_TOKEN_INDEX)
            return ((new_state, new_ids, new_finished),
                    (new_ids, chosen_lp))

        _, (sampled, logprobs) = jax.lax.scan(
            body, (init_state, start_ids, finished0),
            jnp.arange(self.max_output_len))
        sampled = jnp.swapaxes(sampled, 0, 1)
        return sampled, jnp.sum(logprobs, axis=0)

    def ensemble_greedy_outputs(self, contexts: List[Context]):
        """Greedy decode averaging E models' distributions (the
        reference's multi-session logit averaging for the plain
        runner). Returns (avg log-probs (B, L, V), decoded (B, L))."""
        constants = [self.decode_constants(c) for c in contexts]
        states = [self.decode_initial_state(c, k)
                  for c, k in zip(contexts, constants)]
        stacked_constants = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *constants)
        stacked_states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states)
        n_models = len(contexts)
        batch = self._batch_size(contexts[0])
        start_ids = jnp.full((batch,), START_TOKEN_INDEX, jnp.int32)
        finished0 = jnp.zeros((batch,), bool)

        def body(carry, step):
            model_states, prev_ids, finished = carry

            def one(c, s):
                new_s, logits, _ = self.decode_step(
                    c, s, prev_ids, step)
                return new_s, jax.nn.log_softmax(logits, axis=-1)

            new_states, logprobs = jax.vmap(one)(
                stacked_constants, model_states)
            avg = (jax.nn.logsumexp(logprobs, axis=0)
                   - jnp.log(n_models))
            avg = self._mask_unk(avg)
            new_ids = jnp.argmax(avg, axis=-1).astype(jnp.int32)
            new_ids = jnp.where(finished, PAD_TOKEN_INDEX, new_ids)
            new_finished = finished | (new_ids == END_TOKEN_INDEX)
            return ((new_states, new_ids, new_finished),
                    (avg, new_ids))

        _, (logprobs, decoded) = jax.lax.scan(
            body, (stacked_states, start_ids, finished0),
            jnp.arange(self.max_output_len))
        return (jnp.swapaxes(logprobs, 0, 1),
                jnp.swapaxes(decoded, 0, 1))

    @tensor
    def decoded(self, ctx: Context):
        return self.greedy_ids(ctx)

    @tensor
    def runtime_logprobs(self, ctx: Context):
        logits, _, _ = self.greedy_outputs(ctx)
        return jax.nn.log_softmax(logits, axis=-1)

    def _batch_size(self, ctx: Context) -> int:
        for key in (self.input_ids_key,):
            if key in ctx.batch:
                return ctx.batch[key].shape[0]
        # inference: take batch size from any input array
        for value in ctx.batch.values():
            return value.shape[0]
        raise ValueError("Empty batch")
