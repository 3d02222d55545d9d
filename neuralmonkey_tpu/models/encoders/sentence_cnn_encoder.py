"""Convolution-over-time sentence encoders.

- :class:`SentenceCNNEncoder` (reference
  nm/encoders/sentence_cnn_encoder.py): multi-width 1-D convolutions +
  highway layers + optional RNN on top → TemporalStateful.
- :class:`SequenceCNNEncoder` (reference
  nm/encoders/sequence_cnn_encoder.py): multi-width convolutions with
  max-pool-over-time → a single Stateful vector (Kim 2014 classifier
  features).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.sequence import EmbeddedSequence
from ...model.stateful import (Stateful, TemporalStatefulWithOutput)
from ...ops import nn
from ...ops.rnn import bidirectional_rnn
from ...vocabulary import Vocabulary


def _conv1d(x, kernel, stride: int = 1) -> jnp.ndarray:
    """(B, T, Cin) * (W, Cin, Cout) -> (B, T', Cout), SAME padding."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))



def _pallas_ok(ctx) -> bool:
    # inference always may use Pallas kernels; training too now
    # that the GRU scan has a hand-written BPTT kernel
    # (ops/pallas_rnn.py), gated by NM_PALLAS_TRAIN
    from ...ops.kernel_config import use_pallas_train
    return (not ctx.train) or use_pallas_train()

class SentenceCNNEncoder(ModelPart, TemporalStatefulWithOutput):

    def __init__(self, name: str,
                 input_sequence=None,
                 filters: List[Tuple[int, int]] = None,
                 highway_depth: int = 2,
                 rnn_size: int = None,
                 dropout_keep_prob: float = 1.0,
                 # inline sequence sugar
                 vocabulary: Vocabulary = None,
                 data_id: str = None,
                 embedding_size: int = None,
                 max_input_len: int = None,
                 segment_size: int = None,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        del segment_size
        if input_sequence is None:
            input_sequence = EmbeddedSequence(
                name=f"{name}_input", vocabulary=vocabulary,
                data_id=data_id, embedding_size=embedding_size,
                max_length=max_input_len)
        self.input_sequence = input_sequence
        self.filters = filters or [(3, 64), (5, 64)]
        self.highway_depth = highway_depth
        self.rnn_size = rnn_size
        self.dropout_keep_prob = dropout_keep_prob
        self._conv_dim = sum(f for _, f in self.filters)
        self._dim = 2 * rnn_size if rnn_size else self._conv_dim
        if rnn_size:
            self._fw = nn.make_cell("GRU", self._conv_dim, rnn_size)
            self._bw = nn.make_cell("GRU", self._conv_dim, rnn_size)

    @property
    def state_dim(self) -> int:
        return self._dim

    @property
    def output_dim(self) -> int:
        return self._dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {}
        in_dim = self.input_sequence.state_dim
        for i, (width, channels) in enumerate(self.filters):
            rng, sub = jax.random.split(rng)
            params[f"conv_{i}"] = {
                "w": jax.random.normal(sub, (width, in_dim, channels))
                * jnp.sqrt(2.0 / (width * in_dim)),
                "b": jnp.zeros((channels,)),
            }
        for d in range(self.highway_depth):
            rng, sub = jax.random.split(rng)
            params[f"highway_{d}"] = nn.highway_init(sub,
                                                     self._conv_dim)
        if self.rnn_size:
            rng, k1, k2 = jax.random.split(rng, 3)
            params["rnn_fw"] = self._fw.init(k1)
            params["rnn_bw"] = self._bw.init(k2)
        return params

    @tensor
    def temporal_mask(self, ctx: Context):
        return self.input_sequence.temporal_mask(ctx)

    @tensor
    def _cnn_states(self, ctx: Context):
        params = ctx.get_params(self)
        x = self.input_sequence.temporal_states(ctx)
        x = ctx.dropout(self, x, self.dropout_keep_prob, "input")
        convs = []
        for i in range(len(self.filters)):
            conv = _conv1d(x, params[f"conv_{i}"]["w"])
            convs.append(jax.nn.relu(conv + params[f"conv_{i}"]["b"]))
        states = jnp.concatenate(convs, axis=-1)
        for d in range(self.highway_depth):
            states = nn.highway(params[f"highway_{d}"], states)
        return states * self.temporal_mask(ctx)[..., None]

    @tensor
    def temporal_states(self, ctx: Context):
        states = self._cnn_states(ctx)
        if not self.rnn_size:
            return states
        params = ctx.get_params(self)
        mask = self.temporal_mask(ctx)
        out, _ = bidirectional_rnn(self._fw, params["rnn_fw"],
                                   self._bw, params["rnn_bw"],
                                   states, mask,
                                   allow_pallas=_pallas_ok(ctx))
        return out

    @tensor
    def output(self, ctx: Context):
        if self.rnn_size:
            params = ctx.get_params(self)
            mask = self.temporal_mask(ctx)
            _, final = bidirectional_rnn(self._fw, params["rnn_fw"],
                                         self._bw, params["rnn_bw"],
                                         self._cnn_states(ctx), mask,
                                         allow_pallas=_pallas_ok(ctx))
            return final
        states = self.temporal_states(ctx)
        return jnp.max(states, axis=1)


class SequenceCNNEncoder(ModelPart, Stateful):
    """Multi-width conv + max-pool-over-time -> Stateful vector."""

    def __init__(self, name: str,
                 vocabulary: Vocabulary,
                 data_id: str,
                 embedding_size: int,
                 filters: List[Tuple[int, int]] = None,
                 max_input_len: int = None,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.input_sequence = EmbeddedSequence(
            name=f"{name}_input", vocabulary=vocabulary,
            data_id=data_id, embedding_size=embedding_size,
            max_length=max_input_len)
        self.filters = filters or [(2, 32), (3, 32), (4, 32)]
        self.dropout_keep_prob = dropout_keep_prob
        self._dim = sum(f for _, f in self.filters)

    @property
    def output_dim(self) -> int:
        return self._dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {}
        in_dim = self.input_sequence.state_dim
        for i, (width, channels) in enumerate(self.filters):
            rng, sub = jax.random.split(rng)
            params[f"conv_{i}"] = {
                "w": jax.random.normal(sub, (width, in_dim, channels))
                * jnp.sqrt(2.0 / (width * in_dim)),
                "b": jnp.zeros((channels,)),
            }
        return params

    @tensor
    def output(self, ctx: Context):
        params = ctx.get_params(self)
        x = self.input_sequence.temporal_states(ctx)
        mask = self.input_sequence.temporal_mask(ctx)
        x = ctx.dropout(self, x, self.dropout_keep_prob, "input")
        pooled = []
        for i in range(len(self.filters)):
            conv = _conv1d(x, params[f"conv_{i}"]["w"])
            conv = jax.nn.relu(conv + params[f"conv_{i}"]["b"])
            # masked max-pool; relu outputs are >= 0, so 0 is a safe
            # identity even for all-padding rows (batch-pad rows must
            # stay finite end to end)
            conv = conv * (mask[..., None] > 0)
            pooled.append(jnp.max(conv, axis=1))
        return jnp.concatenate(pooled, axis=-1)
