"""Attentive RNN decoder (reference nm/decoders/decoder.py).

Supports the vanilla RNNsearch step (attention queried with the previous
state, cell fed ``[prev_emb, context]``) and the Nematus-style
conditional GRU (cell1 → attention → cell2), output projections
(maxout / mlp / linear), initial state projected from encoder outputs,
and any number of attention objects (incl. multi-source combinators).

Teacher-forced training runs one ``lax.scan`` over time and hoists the
logit projection out of the loop (one big (B·T, P)×(P, V) MXU matmul
instead of T small ones). Greedy decoding implements the
``decode_step`` contract from AutoregressiveDecoder, also used by the
on-device beam search.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import Stateful
from ...ops import nn
from .autoregressive import AutoregressiveDecoder

_OUTPUT_PROJECTIONS = ("maxout", "mlp", "nonlinear", "linear")


class Decoder(AutoregressiveDecoder):

    def __init__(self, name: str,
                 vocabulary,
                 data_id: str,
                 max_output_len: int,
                 rnn_size: int = None,
                 encoders: List[Stateful] = None,
                 attentions: List = None,
                 embedding_size: int = None,
                 embeddings_source=None,
                 tie_embeddings: bool = False,
                 label_smoothing: float = None,
                 rnn_cell: str = "GRU",
                 conditional_gru: bool = False,
                 output_projection: str = "maxout",
                 maxout_size: int = None,
                 dropout_keep_prob: float = 1.0,
                 supress_unk: bool = False,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(
            name=name, vocabulary=vocabulary, data_id=data_id,
            max_output_len=max_output_len,
            dropout_keep_prob=dropout_keep_prob,
            embedding_size=embedding_size,
            embeddings_source=embeddings_source,
            tie_embeddings=tie_embeddings,
            label_smoothing=label_smoothing, supress_unk=supress_unk,
            reuse=reuse, save_checkpoint=save_checkpoint,
            load_checkpoint=load_checkpoint)
        self.encoders = encoders or []
        self.attentions = attentions or []
        if output_projection not in _OUTPUT_PROJECTIONS:
            raise ValueError(
                f"output_projection must be one of {_OUTPUT_PROJECTIONS}")
        self.output_projection = output_projection
        self.rnn_cell_type = rnn_cell
        self.conditional_gru = conditional_gru
        if conditional_gru and rnn_cell not in ("GRU", "OrthoGRU"):
            raise ValueError("conditional_gru requires a GRU cell")

        if rnn_size is None:
            if not self.encoders:
                raise ValueError("Need rnn_size or encoders")
            rnn_size = sum(e.output_dim for e in self.encoders)
        self.rnn_size = rnn_size

        for att in self.attentions:
            att.register_query_dim(rnn_size)
        self.context_dim = sum(a.context_dim for a in self.attentions)

        if conditional_gru:
            self._cell1 = nn.make_cell(rnn_cell, self.embedding_size,
                                       rnn_size)
            self._cell2 = (nn.make_cell(rnn_cell, self.context_dim,
                                        rnn_size)
                           if self.attentions else None)
        else:
            self._cell1 = nn.make_cell(
                rnn_cell, self.embedding_size + self.context_dim,
                rnn_size)
            self._cell2 = None

        # pre-logit projection input: [state, prev_emb, contexts]
        self._prelogit_in = (rnn_size + self.embedding_size
                             + self.context_dim)
        self.maxout_size = (maxout_size if maxout_size is not None
                            else self.embedding_size)
        if output_projection == "maxout":
            self._prelogit_dim = self.maxout_size
        elif output_projection in ("mlp", "nonlinear"):
            self._prelogit_dim = self.embedding_size
        else:
            self._prelogit_dim = self._prelogit_in
        if tie_embeddings and self._prelogit_dim != self.embedding_size:
            raise ValueError(
                "tie_embeddings requires pre-logit dim == embedding size")

    # ------------------------------------------------------------------ #
    @property
    def output_dim(self) -> int:
        return self.rnn_size

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, 6)
        params: Dict[str, Any] = {}
        params["cell1"] = self._cell1.init(keys[0])
        if self._cell2 is not None:
            params["cell2"] = self._cell2.init(keys[1])
        enc_dim = sum(e.output_dim for e in self.encoders)
        if self.encoders:
            params["initial_state"] = nn.linear_init(
                keys[2], enc_dim, self.rnn_size)
        if self.output_projection == "maxout":
            params["prelogit"] = nn.maxout_init(
                keys[3], self._prelogit_in, self.maxout_size)
        elif self.output_projection in ("mlp", "nonlinear"):
            params["prelogit"] = nn.linear_init(
                keys[3], self._prelogit_in, self.embedding_size)
        if not self.tie_embeddings:
            params["logit"] = nn.linear_init(
                keys[4], self._prelogit_dim, len(self.vocabulary))
        else:
            params["logit_bias"] = jnp.zeros((len(self.vocabulary),))
        return params

    # ------------------------------------------------------------------ #
    # shared step machinery
    # ------------------------------------------------------------------ #
    def _make_constants(self, ctx: Context) -> Dict[str, Any]:
        params = ctx.get_params(self)
        return {
            "params": params,
            "att_params": tuple(ctx.get_params(a)
                                for a in self.attentions),
            "att_constants": tuple(a.precompute(ctx)
                                   for a in self.attentions),
            # per-attention base rng for train-time weights dropout
            # (scaled dot-product classes; folded per step in the
            # teacher-forced scan). None outside training or when the
            # attention has no dropout configured.
            "att_dropout_base": tuple(
                (ctx.make_rng(a, "attention_dropout")
                 if ctx.train
                 and getattr(a, "dropout_keep_prob", 1.0) < 1.0
                 else None)
                for a in self.attentions),
            "embed_table":
                ctx.get_params(self.embeddings)["embeddings"],
        }

    def _att_initial_states(self, constants) -> Tuple:
        states = []
        for att, c in zip(self.attentions, constants["att_constants"]):
            if getattr(att, "stateful_attention", False):
                states.append(jnp.zeros_like(c.mask))
            else:
                states.append(None)
        return tuple(states)

    def _attend_all(self, constants, query, att_states, beam=None,
                    dropout_rngs=None):
        """Run every attention for one step. Returns (contexts list,
        weights list, new att_states). With ``beam`` set (lineage beam
        decoding), beam-sharing attentions get their UNtiled constants
        and fold the beam axis internally. ``dropout_rngs`` (train
        scan only) carries one per-step key per attention for
        weights-dropout; inference leaves it None."""
        contexts, weights, new_states = [], [], []
        for i, att in enumerate(self.attentions):
            p = constants["att_params"][i]
            c = constants["att_constants"][i]
            rng_i = dropout_rngs[i] if dropout_rngs else None
            if getattr(att, "stateful_attention", False):
                context, w, new_cov = att.step_with_coverage(
                    p, c, query, att_states[i])
                new_states.append(new_cov)
            else:
                if beam is not None and att.beam_shared_constants:
                    context, w = att.step_beamed(p, c, query, beam)
                else:
                    context, w = att.step(p, c, query,
                                          dropout_rng=rng_i)
                new_states.append(None)
            contexts.append(context)
            weights.append(w)
        return contexts, weights, tuple(new_states)

    def _cell_step(self, constants, state, att_states, embedded_prev,
                   noise_rng=None, beam=None, att_dropout_rngs=None):
        """One decoder cell step. Returns
        (new_state, prelogit_input, weights, new_att_states)."""
        params = constants["params"]
        cell1_kwargs = ({"noise_rng": noise_rng}
                        if noise_rng is not None
                        and isinstance(self._cell1, nn.NoisyGRUCell)
                        else {})
        if self.conditional_gru:
            inter, _ = self._cell1(params["cell1"], state, embedded_prev,
                                   **cell1_kwargs)
            if self.attentions:
                contexts, weights, new_att = self._attend_all(
                    constants, inter, att_states, beam=beam,
                    dropout_rngs=att_dropout_rngs)
                context_cat = jnp.concatenate(contexts, axis=-1)
                new_state, _ = self._cell2(
                    params["cell2"], inter, context_cat)
            else:
                contexts, weights, new_att = [], [], att_states
                context_cat = None
                new_state = inter
        else:
            if self.attentions:
                contexts, weights, new_att = self._attend_all(
                    constants, state, att_states, beam=beam,
                    dropout_rngs=att_dropout_rngs)
                context_cat = jnp.concatenate(contexts, axis=-1)
                cell_in = jnp.concatenate(
                    [embedded_prev, context_cat], axis=-1)
            else:
                contexts, weights, new_att = [], [], att_states
                context_cat = None
                cell_in = embedded_prev
            new_state, _ = self._cell1(params["cell1"], state, cell_in,
                                       **cell1_kwargs)

        pieces = [new_state, embedded_prev]
        if context_cat is not None:
            pieces.append(context_cat)
        prelogit_in = jnp.concatenate(pieces, axis=-1)
        return new_state, prelogit_in, weights, new_att

    def _prelogit(self, params, prelogit_in):
        if self.output_projection == "maxout":
            return nn.maxout(params["prelogit"], prelogit_in)
        if self.output_projection in ("mlp", "nonlinear"):
            return jnp.tanh(nn.linear(params["prelogit"], prelogit_in))
        return prelogit_in

    def _logits(self, constants, prelogit):
        params = constants["params"]
        if self.tie_embeddings:
            return (jnp.dot(prelogit, constants["embed_table"].T,
                            preferred_element_type=jnp.float32)
                    + params["logit_bias"])
        return nn.linear(params["logit"], prelogit)

    @tensor
    def initial_state(self, ctx: Context):
        if not self.encoders:
            batch = self._batch_size(ctx)
            return jnp.zeros((batch, self.rnn_size))
        params = ctx.get_params(self)
        enc_out = jnp.concatenate(
            [e.output(ctx) for e in self.encoders], axis=-1)
        s0 = jnp.tanh(nn.linear(params["initial_state"], enc_out))
        return ctx.dropout(self, s0, self.dropout_keep_prob,
                           "initial_state_dropout")

    # ------------------------------------------------------------------ #
    # teacher-forced training
    # ------------------------------------------------------------------ #
    @tensor
    def train_outputs(self, ctx: Context):
        """Scan over teacher inputs; returns (prelogits (B,T,P),
        attention weight histories tuple)."""
        constants = self._make_constants(ctx)
        inputs = self.train_inputs(ctx)
        embedded = self.embeddings.embed(ctx, inputs)
        embedded = ctx.dropout(self, embedded, self.dropout_keep_prob,
                               "embedding_dropout")
        s0 = self.initial_state(ctx)
        att0 = self._att_initial_states(constants)

        embedded_tm = jnp.swapaxes(embedded, 0, 1)  # (T, B, E)
        noise_base = (ctx.make_rng(self, "cell_noise")
                      if ctx.train
                      and isinstance(self._cell1, nn.NoisyGRUCell)
                      else None)
        steps = jnp.arange(embedded_tm.shape[0])

        att_bases = constants["att_dropout_base"]

        def body(carry, xs):
            emb_t, t = xs
            state, att_states = carry
            noise_rng = (jax.random.fold_in(noise_base, t)
                         if noise_base is not None else None)
            # independent attention-dropout mask per step (reference:
            # tf.nn.dropout draws fresh each dynamic-rnn iteration)
            att_rngs = (tuple(
                (jax.random.fold_in(b, t) if b is not None else None)
                for b in att_bases)
                if any(b is not None for b in att_bases) else None)
            new_state, prelogit_in, weights, new_att = self._cell_step(
                constants, state, att_states, emb_t,
                noise_rng=noise_rng, att_dropout_rngs=att_rngs)
            return (new_state, new_att), (prelogit_in, tuple(weights))

        _, (prelogit_tm, weights_tm) = jax.lax.scan(
            body, (s0, att0), (embedded_tm, steps))
        prelogit_in = jnp.swapaxes(prelogit_tm, 0, 1)  # (B, T, P)
        prelogit_in = ctx.dropout(
            self, prelogit_in, self.dropout_keep_prob, "prelogit_dropout")
        prelogits = self._prelogit(constants["params"], prelogit_in)
        weights = tuple(jnp.swapaxes(w, 0, 1) for w in weights_tm)
        return prelogits, weights

    @tensor
    def train_prelogit_states(self, ctx: Context):
        """(B, T, P) prelogit states — the fused softmax-xent seam
        (autoregressive.py _fused_token_nll; the (B·T, V) logits
        never materialize when the fused tail is eligible)."""
        prelogits, _ = self.train_outputs(ctx)
        return prelogits

    def train_logit_projection(self, ctx: Context):
        """(w, b, transposed) of the output projection in its native
        layout (tied: the raw (V, P) embedding table)."""
        params = ctx.get_params(self)
        if self.tie_embeddings:
            table = ctx.get_params(self.embeddings)["embeddings"]
            return table, params["logit_bias"], True
        logit = params["logit"]
        b = logit.get("b")
        if b is None:
            b = jnp.zeros((logit["w"].shape[1],), jnp.float32)
        return logit["w"], b, False

    @tensor
    def train_logits(self, ctx: Context):
        prelogits, _ = self.train_outputs(ctx)
        constants = self._make_constants(ctx)
        return self._logits(constants, prelogits)

    @tensor
    def train_attention_weights(self, ctx: Context):
        _, weights = self.train_outputs(ctx)
        return weights

    # ------------------------------------------------------------------ #
    # decode contract (greedy scan in base class; beam search reuses it)
    # ------------------------------------------------------------------ #
    def decode_constants(self, ctx: Context):
        return self._make_constants(ctx)

    def tile_decode_constants(self, constants, k: int):
        """Repeat batch-dimensioned constants k× for beam search;
        parameters and embedding tables broadcast untouched. Each
        attention knows which of its constants carry a batch axis."""
        tiled = dict(constants)
        tiled["att_constants"] = tuple(
            att.tile_constants(c, k)
            for att, c in zip(self.attentions,
                              constants["att_constants"]))
        return tiled

    # ------------------------------------------------------------------ #
    # lineage decoding: beam search without post-step state reorder.
    # Unlike the transformer (position-indexed KV caches resolved via
    # the ancestry mask), the RNN's loop state is one small hidden
    # vector — the win here is NOT skipping its reorder but sharing
    # the attention constants across the beam: the tiled keys/values
    # re-read K identical copies every step, the dominant HBM traffic
    # of the RNN beam decode.
    # ------------------------------------------------------------------ #
    lineage_decode = True
    emits_attention = True

    def tile_decode_constants_lineage(self, constants, k: int):
        tiled = dict(constants)
        tiled["att_constants"] = tuple(
            att.tile_constants_lineage(c, k)
            for att, c in zip(self.attentions,
                              constants["att_constants"]))
        return tiled

    def decode_step_lineage(self, constants: Any, loop_state: Any,
                            prev_ids: jnp.ndarray, step: Any,
                            anc: jnp.ndarray, beam: int,
                            window: int = None):
        """The recurrent state is gathered HERE by the previous
        selection's parents — ``anc[:, :, step-1]`` is exactly that
        slot (identity at step 0, where dynamic indexing clamps) —
        instead of by the search after the step; semantically the same
        reorder, one step later. Attention constants stay shared
        across the beam (see ``_attend_all``). ``window`` is a
        cache-read bound; the RNN has no position-indexed cache, so
        it is unused here."""
        del window
        state, att_states = loop_state
        rows = prev_ids.shape[0]
        batch = rows // beam
        parents = jax.lax.dynamic_index_in_dim(
            anc, step - 1, axis=2, keepdims=False)
        flat = ((jnp.arange(batch, dtype=jnp.int32) * beam)[:, None]
                + parents).reshape(-1)
        gather = lambda x: (None if x is None
                            else jnp.take(x, flat, axis=0))
        state = gather(state)
        att_states = tuple(gather(s) for s in att_states)
        embedded_prev = jnp.take(constants["embed_table"], prev_ids,
                                 axis=0)
        new_state, prelogit_in, weights, new_att = self._cell_step(
            constants, state, att_states, embedded_prev, beam=beam)
        prelogit = self._prelogit(constants["params"], prelogit_in)
        logits, sel_aux = self._step_logits(
            constants, prelogit,
            lambda: self._logits(constants, prelogit))
        aux = {"attention_weights": tuple(weights), **sel_aux}
        return (new_state, new_att), logits, aux

    def decode_initial_state(self, ctx: Context, constants):
        return (self.initial_state(ctx),
                self._att_initial_states(constants))

    def decode_step(self, constants: Any, loop_state: Any,
                    prev_ids: jnp.ndarray, step: Any):
        del step
        state, att_states = loop_state
        embedded_prev = jnp.take(constants["embed_table"], prev_ids,
                                 axis=0)
        new_state, prelogit_in, weights, new_att = self._cell_step(
            constants, state, att_states, embedded_prev)
        prelogit = self._prelogit(constants["params"], prelogit_in)
        logits, sel_aux = self._step_logits(
            constants, prelogit,
            lambda: self._logits(constants, prelogit))
        aux = {"attention_weights": tuple(weights), **sel_aux}
        return (new_state, new_att), logits, aux
