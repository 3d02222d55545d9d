"""CTC decoder (reference nm/decoders/ctc_decoder.py): CTC loss +
greedy collapse or prefix beam search over a TemporalStateful encoder
(speech path).

Loss is ``optax.ctc_loss`` (the XLA-native replacement for
tf.nn.ctc_loss); greedy decoding (argmax → collapse repeats → drop
blanks) runs in-graph with vectorized masking. ``beam_width > 1``
switches ``decoded`` to an on-device prefix beam search (Hannun et al.
2014 semantics, the reference's tf.nn.ctc_beam_search_decoder
counterpart): one ``lax.scan`` over the static time axis, K prefixes
per sentence carried as (blank-ending, symbol-ending) log-prob pairs,
with exact merging of an extension that re-creates a prefix already in
the beam. The blank label reuses the vocabulary's <pad>=0 slot.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import TemporalStateful
from ...ops import nn
from ...vocabulary import PAD_TOKEN_INDEX, Vocabulary

BLANK = PAD_TOKEN_INDEX  # = 0
NEG = -1.0e30  # effective -inf that stays NaN-free under arithmetic


class CTCDecoder(ModelPart):

    def __init__(self, name: str,
                 encoder: TemporalStateful,
                 vocabulary: Vocabulary,
                 data_id: str,
                 max_length: int = None,
                 merge_repeated_targets: bool = False,
                 merge_repeated_outputs: bool = True,
                 beam_width: int = 1,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.encoder = encoder
        self.vocabulary = vocabulary
        self.data_id = data_id
        self.max_length = max_length
        self.merge_repeated_targets = merge_repeated_targets
        self.merge_repeated_outputs = merge_repeated_outputs
        self.beam_width = beam_width

    @property
    def labels_key(self) -> str:
        return f"{self.name}.labels"

    @property
    def labels_mask_key(self) -> str:
        return f"{self.name}.labels_mask"

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        return {"logit": nn.linear_init(
            rng, self.encoder.state_dim, len(self.vocabulary))}

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        ids, mask = self.vocabulary.sentences_to_tensor(
            dataset.get_series(self.data_id), max_len=self.max_length)
        return {self.labels_key: ids, self.labels_mask_key: mask}

    # ------------------------------------------------------------------ #
    @tensor
    def logits(self, ctx: Context):
        params = ctx.get_params(self)
        states = self.encoder.temporal_states(ctx)
        return nn.linear(params["logit"], states)

    @tensor
    def train_loss(self, ctx: Context):
        logits = self.logits(ctx)                     # (B, T, V)
        logit_paddings = 1.0 - self.encoder.temporal_mask(ctx)
        labels = ctx.batch[self.labels_key]
        label_paddings = 1.0 - ctx.batch[self.labels_mask_key]
        per_seq = optax.ctc_loss(
            logits, logit_paddings, labels, label_paddings,
            blank_id=BLANK)
        return jnp.mean(per_seq)

    def cost(self, ctx: Context):
        return self.train_loss(ctx)

    runtime_loss = train_loss

    @tensor
    def decoded(self, ctx: Context):
        """Best label sequence (B, T): prefix beam search when
        beam_width > 1, greedy collapse otherwise."""
        if self.beam_width > 1:
            return self.beam_decoded(ctx)
        return self.greedy_decoded(ctx)

    @tensor
    def beam_decoded(self, ctx: Context):
        prefixes, scores = self.beam_search(ctx)
        return prefixes[:, 0, :]  # best-first

    @tensor
    def beam_search(self, ctx: Context):
        """On-device CTC prefix beam search.

        Returns (prefixes (B, K, T) int32 padded with blank, sorted
        best-first; total log-probs (B, K)). Each beam slot carries a
        distinct label sequence with separate blank-/symbol-ending
        probability mass; extending prefix p by symbol c merges exactly
        into an existing beam entry equal to p·c (the property that
        distinguishes prefix beam search from naive path beam search).
        """
        logits = self.logits(ctx)                      # (B, T, V)
        mask = self.encoder.temporal_mask(ctx)         # (B, T)
        lp_frames = jax.nn.log_softmax(logits, axis=-1)
        batch, time, vocab = logits.shape
        k = self.beam_width

        # beam state
        prefixes0 = jnp.zeros((batch, k, time), jnp.int32)
        lengths0 = jnp.zeros((batch, k), jnp.int32)
        last0 = jnp.full((batch, k), -1, jnp.int32)
        # slot 0 = the empty prefix (all mass on "ends in blank");
        # other slots dead
        lp_b0 = jnp.full((batch, k), NEG).at[:, 0].set(0.0)
        lp_nb0 = jnp.full((batch, k), NEG)

        t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, time), 2)

        def step(state, frame):
            prefixes, lengths, last, lp_b, lp_nb = state
            lp, valid = frame                          # (B, V), (B,)
            lp = jnp.where(valid[:, None], lp, NEG)

            total = jnp.logaddexp(lp_b, lp_nb)         # (B, K)

            # prefix unchanged, now ends in blank
            stay_b = total + lp[:, BLANK][:, None]
            # prefix unchanged, repeated last symbol collapses
            last_safe = jnp.maximum(last, 0)
            lp_at_last = jnp.take_along_axis(lp, last_safe, axis=1)
            stay_nb = jnp.where(last >= 0, lp_nb + lp_at_last, NEG)

            # prefix extended by symbol c (blank cannot extend);
            # repeating the last symbol must pass through a blank
            base = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (batch, k, vocab),
                                          2) == last[..., None]),
                lp_b[..., None], total[..., None])     # (B, K, V)
            append = base + lp[:, None, :]
            append = append.at[..., BLANK].set(NEG)

            # exact merge: append (k1, c) that equals the prefix in
            # slot k2 folds its mass into k2's stay bucket and dies
            len_ok = lengths[:, :, None] + 1 == lengths[:, None, :]
            cut = prefixes[:, None, :, :] * (
                t_iota != lengths[:, :, None, None]).astype(jnp.int32)
            same = jnp.all(prefixes[:, :, None, :] == cut, axis=3)
            match = len_ok & same & (last[:, None, :] >= 0)
            app_at_last = jnp.take_along_axis(
                append, jnp.broadcast_to(
                    last_safe[:, None, :], (batch, k, k)), axis=2)
            contrib = jax.nn.logsumexp(
                jnp.where(match, app_at_last, NEG), axis=1)
            stay_nb = jnp.logaddexp(stay_nb, contrib)
            kill = jnp.any(
                match[..., None] & (jax.lax.broadcasted_iota(
                    jnp.int32, (batch, k, k, vocab), 3)
                    == last[:, None, :, None]), axis=2)
            append = jnp.where(kill, NEG, append)

            # candidate scores: K stays then K·V appends
            stay_score = jnp.logaddexp(stay_b, stay_nb)
            cand = jnp.concatenate(
                [stay_score, append.reshape(batch, k * vocab)], axis=1)
            _, idx = jax.lax.top_k(cand, k)
            is_stay = idx < k
            parent = jnp.where(is_stay, idx, (idx - k) // vocab)
            symbol = jnp.where(is_stay, 0, (idx - k) % vocab)

            def g(arr):
                return jnp.take_along_axis(arr, parent, axis=1)

            old_prefix = jnp.take_along_axis(
                prefixes, parent[..., None], axis=1)
            old_len = g(lengths)
            new_prefix = jnp.where(
                (t_iota[0] == old_len[..., None]) & ~is_stay[..., None],
                symbol[..., None], old_prefix)
            new_len = old_len + (~is_stay).astype(jnp.int32)
            new_last = jnp.where(is_stay, g(last), symbol)
            app_val = jnp.take_along_axis(
                append.reshape(batch, k * vocab),
                jnp.maximum(idx - k, 0), axis=1)
            new_lp_b = jnp.where(is_stay, g(stay_b), NEG)
            new_lp_nb = jnp.where(is_stay, g(stay_nb), app_val)

            # masked-out frames leave the beam untouched
            def keep(new, old):
                return jnp.where(valid[:, None, None] if new.ndim == 3
                                 else valid[:, None], new, old)

            return (keep(new_prefix, prefixes), keep(new_len, lengths),
                    keep(new_last, last), keep(new_lp_b, lp_b),
                    keep(new_lp_nb, lp_nb)), None

        frames = (jnp.swapaxes(lp_frames, 0, 1),       # (T, B, V)
                  jnp.swapaxes(mask > 0, 0, 1))        # (T, B)
        (prefixes, lengths, last, lp_b, lp_nb), _ = jax.lax.scan(
            step, (prefixes0, lengths0, last0, lp_b0, lp_nb0), frames)

        scores = jnp.logaddexp(lp_b, lp_nb)
        order = jnp.argsort(-scores, axis=1)
        return (jnp.take_along_axis(prefixes, order[..., None], axis=1),
                jnp.take_along_axis(scores, order, axis=1))

    @tensor
    def greedy_decoded(self, ctx: Context):
        """Greedy CTC: argmax per frame, collapse repeats, drop blanks,
        left-pack the result (in-graph)."""
        logits = self.logits(ctx)
        mask = self.encoder.temporal_mask(ctx)
        frames = jnp.argmax(logits, axis=-1)           # (B, T)
        frames = jnp.where(mask > 0, frames, BLANK)
        if self.merge_repeated_outputs:
            prev = jnp.pad(frames[:, :-1], ((0, 0), (1, 0)),
                           constant_values=BLANK)
            keep = (frames != BLANK) & (frames != prev)
        else:
            keep = frames != BLANK
        # left-pack kept symbols to the front via a stable argsort on
        # (not kept, position)
        time = frames.shape[1]
        order = jnp.argsort(
            (~keep).astype(jnp.int32) * time
            + jax.lax.broadcasted_iota(jnp.int32, frames.shape, 1),
            axis=1)
        packed = jnp.take_along_axis(frames, order, axis=1)
        packed_keep = jnp.take_along_axis(keep, order, axis=1)
        return jnp.where(packed_keep, packed, BLANK)
