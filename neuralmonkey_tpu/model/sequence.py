"""Embedded input sequences (reference nm/model/sequence.py).

``EmbeddedSequence`` maps a tokenized dataset series to embeddings; the
factored variant concatenates embeddings of several aligned series
(e.g. words + POS tags). These are the leaf ModelParts every text
encoder/decoder builds on.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..vocabulary import Vocabulary
from .part import Context, ModelPart, tensor
from .stateful import TemporalStateful


class EmbeddedSequence(ModelPart, TemporalStateful):
    """Token ids -> embedding vectors, plus mask.

    ``scale_embeddings_by_depth`` multiplies by sqrt(embedding_size)
    (transformer convention). ``embeddings_init`` may carry a pretrained
    ``(vocab, dim)`` numpy array.
    """

    def __init__(self, name: str,
                 vocabulary: Vocabulary,
                 data_id: str,
                 embedding_size: int,
                 max_length: int = None,
                 add_start_symbol: bool = False,
                 add_end_symbol: bool = False,
                 scale_embeddings_by_depth: bool = False,
                 embeddings_init: Optional[np.ndarray] = None,
                 table_only: bool = False,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.vocabulary = vocabulary
        self.data_id = data_id
        self.embedding_size = embedding_size
        self.max_length = max_length
        self.add_start_symbol = add_start_symbol
        self.add_end_symbol = add_end_symbol
        self.scale_embeddings_by_depth = scale_embeddings_by_depth
        self.embeddings_init = embeddings_init
        # table_only: the part provides an embedding table (e.g. a
        # decoder's output-side embeddings) but never feeds input data
        self.table_only = table_only
        if embedding_size <= 0:
            raise ValueError("Embedding size must be positive")

    # ------------------------------------------------------------------ #
    @property
    def state_dim(self) -> int:
        return self.embedding_size

    @property
    def ids_key(self) -> str:
        return f"{self.name}.ids"

    @property
    def mask_key(self) -> str:
        return f"{self.name}.mask"

    def param_partition_specs(self) -> Dict[str, tuple]:
        # (V, E) table shards its vocab rows over the model axis
        return {"embeddings": ("model", None)}

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self.embeddings_init is not None:
            table = jnp.asarray(self.embeddings_init, jnp.float32)
            if table.shape != (len(self.vocabulary), self.embedding_size):
                raise ValueError(
                    f"Pretrained embeddings shape {table.shape} != "
                    f"({len(self.vocabulary)}, {self.embedding_size})")
        else:
            table = jax.random.normal(
                rng, (len(self.vocabulary), self.embedding_size)) * 0.01
        return {"embeddings": table}

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if self.table_only or not dataset.has_series(self.data_id):
            return {}
        sentences = dataset.get_series(self.data_id)
        ids, mask = self.vocabulary.sentences_to_tensor(
            sentences, max_len=self.max_length, train_mode=train,
            add_start_symbol=self.add_start_symbol,
            add_end_symbol=self.add_end_symbol)
        return {self.ids_key: ids, self.mask_key: mask}

    # ------------------------------------------------------------------ #
    @tensor
    def data(self, ctx: Context):
        return ctx.batch[self.ids_key]

    @tensor
    def temporal_mask(self, ctx: Context):
        return ctx.batch[self.mask_key]

    def embed(self, ctx: Context, ids):
        """Embed arbitrary id arrays with this sequence's table (used by
        decoders feeding back their own predictions)."""
        table = ctx.get_params(self)["embeddings"]
        embedded = jnp.take(table, ids, axis=0)
        if self.scale_embeddings_by_depth:
            embedded = embedded * jnp.sqrt(
                jnp.asarray(self.embedding_size, embedded.dtype))
        return embedded

    @tensor
    def temporal_states(self, ctx: Context):
        return self.embed(ctx, self.data(ctx))


class EmbeddedFactorSequence(ModelPart, TemporalStateful):
    """Concatenation of per-factor embeddings over aligned series
    (reference's factored inputs)."""

    def __init__(self, name: str,
                 vocabularies: List[Vocabulary],
                 data_ids: List[str],
                 embedding_sizes: List[int],
                 max_length: int = None,
                 add_start_symbol: bool = False,
                 add_end_symbol: bool = False,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        if not (len(vocabularies) == len(data_ids)
                == len(embedding_sizes)):
            raise ValueError(
                "vocabularies, data_ids and embedding_sizes must have "
                "the same length")
        self.vocabularies = vocabularies
        self.data_ids = data_ids
        self.embedding_sizes = embedding_sizes
        self.max_length = max_length
        self.add_start_symbol = add_start_symbol
        self.add_end_symbol = add_end_symbol

    @property
    def state_dim(self) -> int:
        return sum(self.embedding_sizes)

    def _ids_key(self, factor: int) -> str:
        return f"{self.name}.{factor}.ids"

    @property
    def mask_key(self) -> str:
        return f"{self.name}.mask"

    def param_partition_specs(self) -> Dict[str, tuple]:
        return {f"embeddings_{i}": ("model", None)
                for i in range(len(self.vocabularies))}

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        tables = {}
        for i, (vocab, size) in enumerate(
                zip(self.vocabularies, self.embedding_sizes)):
            rng, sub = jax.random.split(rng)
            tables[f"embeddings_{i}"] = (
                jax.random.normal(sub, (len(vocab), size)) * 0.01)
        return tables

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        mask = None
        for i, (vocab, data_id) in enumerate(
                zip(self.vocabularies, self.data_ids)):
            sentences = dataset.get_series(data_id)
            ids, m = vocab.sentences_to_tensor(
                sentences, max_len=self.max_length, train_mode=train,
                add_start_symbol=self.add_start_symbol,
                add_end_symbol=self.add_end_symbol)
            out[self._ids_key(i)] = ids
            if mask is None or m.shape[1] > mask.shape[1]:
                mask = m
        out[self.mask_key] = mask
        return out

    @tensor
    def temporal_mask(self, ctx: Context):
        return ctx.batch[self.mask_key]

    @tensor
    def temporal_states(self, ctx: Context):
        params = ctx.get_params(self)
        parts = []
        time = ctx.batch[self.mask_key].shape[1]
        for i in range(len(self.data_ids)):
            ids = ctx.batch[self._ids_key(i)][:, :time]
            parts.append(jnp.take(params[f"embeddings_{i}"], ids, axis=0))
        return jnp.concatenate(parts, axis=-1)
