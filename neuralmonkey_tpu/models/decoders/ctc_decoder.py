"""CTC decoder (reference nm/decoders/ctc_decoder.py): CTC loss +
greedy collapse over a TemporalStateful encoder (speech path).

Loss is ``optax.ctc_loss`` (the XLA-native replacement for
tf.nn.ctc_loss); greedy decoding (argmax → collapse repeats → drop
blanks) runs in-graph with vectorized masking. The blank label reuses
the vocabulary's <pad>=0 slot.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import TemporalStateful
from ...ops import nn
from ...vocabulary import PAD_TOKEN_INDEX, Vocabulary

BLANK = PAD_TOKEN_INDEX  # = 0


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

    def init_params(self, rng):
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
