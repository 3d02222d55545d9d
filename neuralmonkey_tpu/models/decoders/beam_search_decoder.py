"""On-device beam search (reference nm/decoders/beam_search_decoder.py).

The reference stepped the beam from Python, one ``session.run`` per
decode step (SURVEY.md §4.4) — the #1 performance target of this
rebuild. Here the whole search is a single jitted ``lax.while_loop``:

- batch×beam flattened to one leading axis so the parent decoder's
  ``decode_step`` runs all beams in one MXU-friendly batch;
- per-step: log-softmax + Wu et al. (2016) length penalty → top-k over
  (beam·vocab) → gather-based reorder of the whole loop-state pytree by
  parent indices (static shapes, finished-beam masking — SURVEY.md
  §8.3 item 1);
- the top-k is *hierarchical* at production vocab sizes (the round-1
  profile showed beam bookkeeping at ~3.4 ms/step vs ~0.4 ms of model
  compute): reduce each beam's vocab to per-128-lane row maxima, top-k
  over rows, then the exact top-k over the selected rows' union. Any
  row holding a global top-k element necessarily ranks in the top-k
  rows by maximum (a row max IS an element), so the result is exact —
  and because score = (logit − lse + logprob_sum)/penalty is a
  monotone per-beam affine map, the row maxima are computed on raw
  logits and only the tiny candidate set ever gets full scoring. No
  (B, K, V)-sized intermediate is materialized;
- early exit when every hypothesis has finished (while_loop, not scan,
  so short batches don't pay for max_steps);
- *lineage decoding* for decoders that support it (transformer): the
  per-step reorder of position-indexed caches — a gather+rewrite of
  every layer's KV cache, the dominant HBM cost of transformer beam
  decode — is replaced by a (B, K, T) ancestry matrix composed with
  the parent indices each step; the decoder resolves lineage in score
  space (TransformerDecoder.decode_step_lineage). Exactness is
  equivalence-tested against the physical reorder;
- checkpoint ensembling: E parameter sets are vmapped through the
  parent step inside the same jit and their distributions averaged —
  the reference's multi-session logit averaging without K processes
  (SURVEY.md §8.3 item 5).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart
from ...vocabulary import END_TOKEN_INDEX, PAD_TOKEN_INDEX, START_TOKEN_INDEX
from .autoregressive import AutoregressiveDecoder

NEG_INF = -1e9


class SearchState(NamedTuple):
    """Per-(batch, beam) search bookkeeping (reference's SearchState)."""
    logprob_sum: jnp.ndarray   # (B, K) raw summed log-probs
    lengths: jnp.ndarray       # (B, K) int32, tokens emitted (incl </s>)
    finished: jnp.ndarray      # (B, K) bool
    token_ids: jnp.ndarray     # (B, K, L) int32 emitted tokens


class BeamSearchOutput(NamedTuple):
    token_ids: jnp.ndarray     # (B, K, L) sorted best-first
    lengths: jnp.ndarray       # (B, K)
    scores: jnp.ndarray        # (B, K) length-normalized
    # (B, K, L, T_src) per-step attention of each final hypothesis,
    # present only when search(..., with_attention=True) and the parent
    # emits attention weights (reference: runner-agnostic attention
    # histories, nm/attention/base_attention.py)
    attention: Optional[jnp.ndarray] = None


def length_penalty(lengths, alpha: float):
    """Wu et al. (2016) GNMT length normalization."""
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def _tile_beam(tree, beam_size: int):
    """Repeat every array's batch axis K times: (B, ...) -> (B*K, ...)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree)


def _gather_beams(tree, parents, batch: int, beam: int):
    """Reorder flattened (B*K, ...) state by per-batch parent indices
    (B, K)."""
    offsets = (jnp.arange(batch, dtype=jnp.int32) * beam)[:, None]
    flat_idx = (offsets + parents).reshape(-1)  # (B*K,)
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, flat_idx, axis=0), tree)


class BeamSearchDecoder(ModelPart):

    def __init__(self, name: str,
                 parent_decoder: AutoregressiveDecoder,
                 beam_size: int,
                 length_normalization: float = 0.6,
                 max_steps: int = None,
                 use_approx_top_k: bool = False,
                 selection_method: str = "auto",
                 align_logits: bool = False,
                 lineage: str = "auto",
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.parent_decoder = parent_decoder
        self.beam_size = beam_size
        self.length_normalization = length_normalization
        # KV caches / position encodings in the parent are sized by
        # max_output_len; steps past it would silently overwrite the
        # last cache slot (dynamic_update_slice clamps) — clamp here.
        self.max_steps = min(max_steps or parent_decoder.max_output_len,
                             parent_decoder.max_output_len)
        # TPU-native approximate top-k (recall ~0.95): selected
        # hypotheses' scores stay exact. Only used in the 'flat' path.
        self.use_approx_top_k = use_approx_top_k
        # 'flat' = one lax.top_k over (B, K·V); 'hierarchical' = exact
        # row-max two-stage selection (see module docstring); 'auto'
        # picks hierarchical at vocab sizes where the flat path's
        # full-vocab passes dominate the step.
        if selection_method not in ("auto", "flat", "hierarchical"):
            raise ValueError(
                f"Unknown selection_method: {selection_method}")
        self.selection_method = selection_method
        # lane-align the logit projection once per search, removing the
        # hierarchical selector's per-step pad pass (~0.1 ms at 30k
        # vocab). OFF by default: combined with the Pallas rowmax/lse
        # kernel inside the full search graph it triggers a TPU-worker
        # kernel fault on v5e (single-step and scan repros are clean;
        # semantics are equivalence-tested on CPU). Safe to enable
        # with NM_USE_PALLAS=0 or on backends without the fault.
        self.align_logits = align_logits
        # lineage decoding: skip the physical per-step reorder of the
        # parent's loop state (transformer KV caches — the dominant
        # HBM cost of its beam decode) and resolve beam ancestry in
        # score space instead (decode_step_lineage). 'auto' uses it
        # whenever the parent supports it; NM_LINEAGE=0/1 overrides
        # for A/B measurement.
        if lineage not in ("auto", "on", "off"):
            raise ValueError(f"Unknown lineage mode: {lineage}")
        self.lineage = lineage

    def _use_lineage(self) -> bool:
        import os
        env = os.environ.get("NM_LINEAGE")
        if env is not None and env != "":
            mode = "on" if env not in ("0", "off") else "off"
        else:
            mode = self.lineage
        supported = getattr(self.parent_decoder, "lineage_decode", False)
        if mode == "on" and not supported:
            raise ValueError(
                f"lineage='on' but {type(self.parent_decoder).__name__} "
                "does not implement lineage decoding")
        return mode != "off" and supported

    @property
    def vocabulary(self):
        return self.parent_decoder.vocabulary

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        return {}  # wraps the parent's parameters

    # ------------------------------------------------------------------ #
    def search(self, ctx: Context,
               with_attention: bool = False) -> BeamSearchOutput:
        """Single-model beam search."""
        parent = self.parent_decoder
        constants = parent.decode_constants(ctx)
        init_state = parent.decode_initial_state(ctx, constants)
        batch = parent._batch_size(ctx)
        return self._search_impl(
            [constants], [init_state], batch,
            with_attention=with_attention)

    def ensemble_search(self, contexts: List[Context]) -> BeamSearchOutput:
        """Beam search averaging E models' distributions."""
        parent = self.parent_decoder
        constants = [parent.decode_constants(c) for c in contexts]
        states = [parent.decode_initial_state(c, k)
                  for c, k in zip(contexts, constants)]
        batch = parent._batch_size(contexts[0])
        return self._search_impl(constants, states, batch)

    # ------------------------------------------------------------------ #
    # per-step candidate selection
    #
    # Both selectors share one contract: given per-beam scores
    # ``x`` (B·K, V) — raw logits (normalized=False) or proper
    # log-probs (normalized=True) — and the current SearchState,
    # return (parents (B,K) int32, tokens (B,K) int32,
    # new_logprob_sum (B,K) unnormalized, top_scores (B,K) normed),
    # best-first. Finished beams contribute exactly one candidate:
    # PAD at zero incremental cost.
    # ------------------------------------------------------------------ #
    def _select_flat(self, x, normalized: bool, search: SearchState,
                     batch: int, precomputed=None):
        """One lax.top_k over the full (B, K·V) score matrix."""
        del precomputed  # only the hierarchical selector uses it
        beam = self.beam_size
        vocab = x.shape[-1]
        logprobs = x if normalized else jax.nn.log_softmax(x, axis=-1)
        logprobs = logprobs.reshape(batch, beam, vocab)

        # finished beams may only emit PAD at zero cost
        pad_only = jnp.full((vocab,), NEG_INF).at[
            PAD_TOKEN_INDEX].set(0.0)
        logprobs = jnp.where(search.finished[..., None],
                             pad_only[None, None, :], logprobs)

        total = search.logprob_sum[..., None] + logprobs
        new_lengths = search.lengths + (~search.finished).astype(
            jnp.int32)
        normed = total / length_penalty(
            new_lengths, self.length_normalization)[..., None]

        flat_scores = normed.reshape(batch, beam * vocab)
        if self.use_approx_top_k:
            top_scores, top_idx = jax.lax.approx_max_k(
                flat_scores, beam)
        else:
            top_scores, top_idx = jax.lax.top_k(flat_scores, beam)
        parents = (top_idx // vocab).astype(jnp.int32)   # (B, K)
        tokens = (top_idx % vocab).astype(jnp.int32)     # (B, K)
        new_logprob = jnp.take_along_axis(
            total.reshape(batch, beam * vocab), top_idx, axis=1)
        return parents, tokens, new_logprob, top_scores

    def _select_hier(self, x, normalized: bool, search: SearchState,
                     batch: int, precomputed=None):
        """Exact two-stage selection without (B, K, V) intermediates.

        Stage 1 reduces every 128-lane row of each beam's vocab to its
        maximum (cheap lane reduction; score is a monotone per-beam
        affine map of x, so raw-x row maxima order rows correctly),
        takes the top-K rows, and stage 2 scores only those K rows'
        K·128 elements exactly. Correctness: a row containing a global
        top-K element has row-max ≥ that element, and any row whose max
        beats the K-th element holds a top-K element itself (its max IS
        an element) — so at most K−1 rows can outrank a top-K element's
        row, and stage 1 never drops one. Ties may resolve differently
        from the flat path (quality-equivalent)."""
        beam = self.beam_size
        vocab = x.shape[-1]
        lane = 128
        rows_per_beam = -(-vocab // lane)
        vp = rows_per_beam * lane
        if vp != vocab:
            # 4·NEG_INF keeps padding strictly below even "dead" beam
            # continuations (logprob_sum = NEG_INF + finite logprob)
            x = jnp.pad(x, ((0, 0), (0, vp - vocab)),
                        constant_values=4 * NEG_INF)

        # fused single-read rowmax + logsumexp (Pallas on TPU, pure-JAX
        # twin elsewhere). NOTE: keep the (N, R, 128) 2-D-batched shape
        # for these reductions — reducing a (B, K, R, 128) view to
        # (B, K, R) lowers through a pathological layout on TPU
        # (~0.5 ms/step measured vs ~0.13 ms for this form).
        from ...ops.beam_select import rowmax_lse
        x32 = x.astype(jnp.float32)
        if precomputed is not None and (
                normalized
                or precomputed[0].shape[-1] != rows_per_beam):
            precomputed = None  # stale/mismatched fusion aux
        logits3 = None
        if precomputed is not None and len(precomputed) > 2:
            logits3 = precomputed[2]
        if normalized:
            lse = jnp.zeros((batch, beam), jnp.float32)
            rowmax = jnp.max(
                x32.reshape(batch * beam, rows_per_beam, lane),
                axis=2).reshape(batch, beam, rows_per_beam)
        elif precomputed is not None:
            # the decode step emitted the reductions from the fused
            # logit-projection epilogue (prepare_selection_fusion) —
            # the logits matrix is never re-read here
            rowmax2, lse2 = precomputed[0], precomputed[1]
            rowmax = rowmax2.astype(jnp.float32).reshape(
                batch, beam, rows_per_beam)
            lse = lse2.astype(jnp.float32).reshape(batch, beam)
        else:
            rowmax2, lse2 = rowmax_lse(x32)
            rowmax = rowmax2.reshape(batch, beam, rows_per_beam)
            lse = lse2.reshape(batch, beam)

        new_lengths = search.lengths + (~search.finished).astype(
            jnp.int32)
        inv_pen = 1.0 / length_penalty(
            new_lengths, self.length_normalization)       # (B, K)
        # finished beams keep lengths, so inv_pen is theirs too
        fin_score = search.logprob_sum * inv_pen
        srow = (rowmax - lse[..., None]
                + search.logprob_sum[..., None]) * inv_pen[..., None]
        srow = jnp.where(search.finished[..., None], NEG_INF, srow)
        srow = srow.at[..., 0].set(
            jnp.where(search.finished, fin_score, srow[..., 0]))

        # stage 1: top-K rows across all beams of each sentence
        # (small_topk = exact Pallas extraction; lax.top_k costs
        # ~0.15 ms/call at these shapes)
        from ...ops.beam_select import small_topk
        n_rows = beam * rows_per_beam
        _, row_idx = small_topk(
            srow.reshape(batch, n_rows), beam)            # (B, K)

        # stage 2: exact scores for the selected rows only. Prefer the
        # window-tiled (N, R, 128) logits from the fused epilogue: this
        # reshape is then a free bitcast (R % 8 == 0), where the
        # row-tiled 2-D form pays a full HBM relayout (~1 ms/step at
        # beam-20 bench shapes — the two layouts tile sublanes over
        # different axes)
        x3 = (logits3 if logits3 is not None
              else x.reshape(batch * beam, rows_per_beam, lane))
        cand = jnp.take_along_axis(
            x3.reshape(batch, n_rows, lane),
            row_idx[..., None], axis=1).astype(jnp.float32)
        parent_of_row = (row_idx // rows_per_beam).astype(jnp.int32)

        def g(arr):
            return jnp.take_along_axis(arr, parent_of_row, axis=1)

        total_cand = (cand - g(lse)[..., None]
                      + g(search.logprob_sum)[..., None])
        scores_cand = total_cand * g(inv_pen)[..., None]
        v_cand = ((row_idx % rows_per_beam)[..., None] * lane
                  + jnp.arange(lane)[None, None, :])      # (B, K, 128)
        fin_g = g(search.finished)[..., None]
        is_pad = v_cand == PAD_TOKEN_INDEX
        scores_cand = jnp.where(
            fin_g, jnp.where(is_pad, g(fin_score)[..., None], NEG_INF),
            scores_cand)
        total_cand = jnp.where(
            fin_g,
            jnp.where(is_pad, g(search.logprob_sum)[..., None],
                      NEG_INF),
            total_cand)

        top_scores, idx2 = small_topk(
            scores_cand.reshape(batch, beam * lane), beam)
        sel_row = idx2 // lane
        sel_lane = idx2 % lane
        parents = jnp.take_along_axis(parent_of_row, sel_row, axis=1)
        tokens = (jnp.take_along_axis(row_idx % rows_per_beam,
                                      sel_row, axis=1) * lane
                  + sel_lane).astype(jnp.int32)
        new_logprob = jnp.take_along_axis(
            total_cand.reshape(batch, beam * lane), idx2, axis=1)
        return parents, tokens, new_logprob, top_scores

    # ------------------------------------------------------------------ #
    def _search_impl(self, constants_list, init_states, batch: int,
                     with_attention: bool = False) -> BeamSearchOutput:
        parent = self.parent_decoder
        beam = self.beam_size
        # selectors size themselves from the logits' trailing dim (a
        # decoder may emit lane-padded logits, see _select_hier)
        vocab = len(parent.vocabulary)
        max_steps = self.max_steps
        n_models = len(constants_list)
        use_lineage = self._use_lineage()
        # ancestry rows index the parent's position-indexed caches
        cache_len = parent.max_output_len

        method = self.selection_method
        if method == "auto":
            # hierarchical wins once full-vocab elementwise passes
            # dominate; at toy vocab sizes flat is simpler and equal
            method = ("flat" if vocab < 2048 or self.use_approx_top_k
                      else "hierarchical")

        if method == "hierarchical" and n_models == 1 \
                and self.align_logits:
            # lane-align the logit projection once so the selector
            # never pays a per-step pad pass (single-model path only:
            # it feeds raw logits; see __init__ for why this is
            # opt-in)
            constants_list = [
                parent.align_logits_for_selection(c)
                for c in constants_list]

        if method == "hierarchical" and n_models == 1:
            # fused logit-projection epilogue: decode steps emit the
            # selector's rowmax/lse reductions with the logits (one
            # HBM pass); no-op when the backend keeps kernels off
            constants_list = [
                parent.prepare_selection_fusion(c)
                for c in constants_list]

        # tile constants/states to batch*beam (the parent knows which
        # constants carry a batch axis — parameters must not be tiled;
        # lineage decoders keep beam-invariant constants untiled)
        tile_fn = (parent.tile_decode_constants_lineage if use_lineage
                   else parent.tile_decode_constants)
        tiled_constants = [tile_fn(c, beam) for c in constants_list]
        # decoders may tile their loop state into a kernel-specific
        # layout (the transformer's fused lineage-attention caches) —
        # single-model lineage searches only (the ensemble vmap stacks
        # states, which must stay plain row-tiled trees)
        tile_state = getattr(parent, "tile_decode_state", None)
        if tile_state is not None and n_models == 1:
            tiled_states = [tile_state(s, beam, use_lineage)
                            for s in init_states]
        else:
            tiled_states = [_tile_beam(s, beam) for s in init_states]
        if n_models > 1:
            stacked_constants = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *tiled_constants)
            stacked_states = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *tiled_states)
        else:
            stacked_constants = tiled_constants[0]
            stacked_states = tiled_states[0]

        # beam 0 live, others dead (standard first-step trick)
        logprob0 = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((beam - 1,), NEG_INF)]
            )[None, :], (batch, 1))
        search0 = SearchState(
            logprob_sum=logprob0,
            lengths=jnp.zeros((batch, beam), jnp.int32),
            finished=jnp.zeros((batch, beam), bool),
            token_ids=jnp.full((batch, beam, max_steps),
                               PAD_TOKEN_INDEX, jnp.int32))
        prev_ids0 = jnp.full((batch * beam,), START_TOKEN_INDEX,
                             jnp.int32)

        def step_fn(c, s, prev_ids, step, anc, window):
            if use_lineage:
                return parent.decode_step_lineage(
                    c, s, prev_ids, step, anc, beam, window=window)
            return parent.decode_step(c, s, prev_ids, step)

        def model_scores(model_states, prev_ids, step, anc, window):
            """Per-beam next-token scores (+ attention weights when the
            parent emits them). Returns raw logits for a single model
            (selection only needs a per-beam monotone score; full
            normalization happens lazily inside the selector) or
            ensemble-averaged log-probs (already normalized: their
            logsumexp is exactly 0)."""
            if n_models == 1:
                new_states, logits, aux = step_fn(
                    stacked_constants, model_states, prev_ids, step,
                    anc, window)
                weights = (aux.get("attention_weights", ())
                           if isinstance(aux, dict) else ())
                sel = (None if not isinstance(aux, dict)
                       or "sel_rowmax" not in aux
                       else (aux["sel_rowmax"], aux["sel_lse"],
                             aux.get("sel_logits3")))
                return (new_states, logits, False,
                        weights[0] if weights else None, sel)
            def one(c, s):
                new_s, logits, _ = step_fn(c, s, prev_ids, step, anc,
                                           window)
                return new_s, jax.nn.log_softmax(logits, axis=-1)
            new_states, logprobs = jax.vmap(one)(
                stacked_constants, model_states)
            # arithmetic mean of probabilities, numerically stable
            avg = jax.nn.logsumexp(logprobs, axis=0) - jnp.log(n_models)
            return new_states, avg, True, None, None

        select_fn = (self._select_hier if method == "hierarchical"
                     else self._select_flat)

        # lineage ancestry starts as the identity: every position of
        # every beam slot is (to be) written by that slot itself
        anc0 = jnp.broadcast_to(
            jnp.arange(beam, dtype=jnp.int32)[None, :, None],
            (batch, beam, cache_len))

        # Lineage decoders read position-indexed caches only up to a
        # STATIC window; running the search as a few segmented
        # while_loops with growing windows cuts early-step cache
        # traffic (~1/3 on average at three segments) at the price of
        # compiling the step body per segment. Exact: positions beyond
        # the window are invalid at every step the segment runs.
        if use_lineage and max_steps >= 8:
            bounds = sorted({-(-max_steps // 4), -(-max_steps // 2),
                             max_steps})
        else:
            bounds = [max_steps]

        # attention histories (the reference's runner-agnostic
        # attention visualization): per-step weights of the FIRST
        # attention, carried in the loop and resolved to the final
        # hypotheses after the search. Only for single-model searches
        # whose parent emits weights (RNN decoder; the transformer's
        # incremental step does not expose per-head weights).
        record = bool(with_attention and n_models == 1
                      and getattr(parent, "emits_attention", False))
        if record:
            shapes = jax.eval_shape(
                lambda c, s, p, a: step_fn(
                    c, s, p, jnp.asarray(0, jnp.int32), a, bounds[0]),
                stacked_constants, stacked_states, prev_ids0, anc0)
            aux_shapes = shapes[2]
            w_shapes = (aux_shapes.get("attention_weights", ())
                        if isinstance(aux_shapes, dict) else ())
            if not w_shapes:
                record = False
        if record:
            src_len = w_shapes[0].shape[-1]
            hist0 = jnp.zeros((batch, beam, max_steps, src_len),
                              jnp.float32)
        else:
            hist0 = jnp.zeros((0,), jnp.float32)

        def make_cond(bound):
            def cond(carry):
                step, _, _, search, _, _, _ = carry
                return jnp.logical_and(step < bound,
                                       ~jnp.all(search.finished))
            return cond

        def make_body(window):
            def body(carry):
                (step, model_states, prev_ids, search, _, anc,
                 hist) = carry
                (new_model_states, x, normalized, weights,
                 sel) = model_scores(
                    model_states, prev_ids, step, anc, window)
                parents, tokens, new_logprob, top_scores = select_fn(
                    x, normalized, search, batch, precomputed=sel)

                if record:
                    w = weights.reshape(batch, beam, -1).astype(
                        hist.dtype)
                    if use_lineage:
                        # slot-indexed rows; the final ancestry matrix
                        # names, per hypothesis and position, the slot
                        # that wrote it (anc[b,k,step] == parents[b,k]
                        # after this step's composition)
                        hist = jax.lax.dynamic_update_slice_in_dim(
                            hist, w[:, :, None, :], step, axis=2)
                    else:
                        # physical reorder: move histories with their
                        # hypotheses, then append the parent's weights
                        sel_w = jnp.take_along_axis(
                            w, parents[..., None], axis=1)
                        moved = jnp.take_along_axis(
                            hist, parents[..., None, None], axis=1)
                        hist = jax.lax.dynamic_update_slice_in_dim(
                            moved, sel_w[:, :, None, :], step, axis=2)

                if use_lineage:
                    # loop state is never reordered; compose the
                    # ancestry instead: inherit the parent's lineage
                    # for written positions, stay identity for future
                    # ones (each slot writes its own row)
                    inherited = jnp.take_along_axis(
                        anc, parents[..., None], axis=1)
                    pos = jnp.arange(cache_len)[None, None, :]
                    anc = jnp.where(pos <= step, inherited, anc0)
                # gather beam-indexed decoder state by parents
                elif n_models > 1:
                    new_model_states = jax.tree_util.tree_map(
                        lambda x: jax.vmap(
                            lambda arr: _gather_beams(
                                arr, parents, batch, beam))(x),
                        new_model_states)
                else:
                    new_model_states = _gather_beams(
                        new_model_states, parents, batch, beam)

                def gather_bk(arr):
                    return jnp.take_along_axis(arr, parents, axis=1)

                old_finished = gather_bk(search.finished)
                old_lengths = gather_bk(search.lengths)
                old_tokens = jnp.take_along_axis(
                    search.token_ids, parents[..., None], axis=1)

                # defensive clamp: lane-aligned logits carry padding
                # columns at bias -1e9 that can never win a selection,
                # but an emitted id must always index the real
                # vocabulary
                tokens = jnp.minimum(tokens, vocab - 1)
                emit = jnp.where(old_finished, PAD_TOKEN_INDEX, tokens)
                new_token_ids = jax.lax.dynamic_update_slice_in_dim(
                    old_tokens, emit[..., None], step, axis=2)

                # summed logprob of the selected continuation
                # (finished parents continue with PAD at zero cost, so
                # their sum stays fixed)
                new_finished = old_finished | (emit == END_TOKEN_INDEX)
                new_len = old_lengths + (~old_finished).astype(
                    jnp.int32)

                new_search = SearchState(
                    logprob_sum=new_logprob,
                    lengths=new_len,
                    finished=new_finished,
                    token_ids=new_token_ids)
                return (step + 1, new_model_states, emit.reshape(-1),
                        new_search, top_scores, anc, hist)
            return body

        init_scores = jnp.zeros((batch, beam))
        carry = (jnp.asarray(0, jnp.int32), stacked_states, prev_ids0,
                 search0, init_scores, anc0, hist0)
        for bound in bounds:
            carry = jax.lax.while_loop(
                make_cond(bound), make_body(bound), carry)
        _, _, _, search, _, anc, hist = carry

        final_scores = search.logprob_sum / length_penalty(
            search.lengths, self.length_normalization)
        # sort beams best-first
        order = jnp.argsort(-final_scores, axis=1)
        attention = None
        if record:
            if use_lineage:
                # resolve slot-indexed rows through the ancestry:
                # row t of hypothesis k lives in slot anc[b, k, t]
                idx = jnp.broadcast_to(
                    anc[:, :, :max_steps, None], hist.shape)
                hist = jnp.take_along_axis(hist, idx, axis=1)
            attention = jnp.take_along_axis(
                hist,
                jnp.broadcast_to(order[..., None, None], hist.shape),
                axis=1)
        return BeamSearchOutput(
            token_ids=jnp.take_along_axis(
                search.token_ids, order[..., None], axis=1),
            lengths=jnp.take_along_axis(search.lengths, order, axis=1),
            scores=jnp.take_along_axis(final_scores, order, axis=1),
            attention=attention)
