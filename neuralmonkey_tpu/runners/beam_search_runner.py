"""Beam-search runner (reference nm/runners/beam_search_runner.py).

The reference drove the beam step-by-step from Python; here the whole
search is one jitted call (see decoders/beam_search_decoder.py) and the
runner only picks the ``rank``-th hypothesis and maps ids to tokens.
With K>1 restored checkpoints the runtime dispatches to
``ensemble_fetches`` and the distributions are averaged inside the jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import numpy as np

from ..model.part import Context
from ..vocabulary import END_TOKEN_INDEX, PAD_TOKEN_INDEX
from .base_runner import BaseRunner, ExecutionResult


class BeamSearchRunner(BaseRunner):

    def __init__(self, output_series: str, decoder,
                 rank: int = 1,
                 postprocess: Callable = None,
                 visualize_attention: bool = False) -> None:
        # `decoder` is a BeamSearchDecoder wrapping the parent decoder
        super().__init__(output_series, decoder)
        if rank < 1 or rank > decoder.beam_size:
            raise ValueError(
                f"Rank must be in [1, beam_size={decoder.beam_size}], "
                f"got {rank}")
        self.rank = rank
        self.postprocess = postprocess
        # record per-step attention of the final hypotheses inside the
        # search loop; the training loop writes the rank-th
        # hypothesis's matrix as PNG heatmaps (same feature as the
        # greedy runner's — the reference's histories were
        # runner-agnostic, nm/attention/base_attention.py)
        self.visualize_attention = visualize_attention

    @property
    def all_parts(self):
        return [self.decoder, self.decoder.parent_decoder]

    def fetches(self, ctx: Context) -> Dict:
        output = self.decoder.search(
            ctx, with_attention=self.visualize_attention)
        out = {"token_ids": output.token_ids,
               "scores": output.scores,
               "lengths": output.lengths}
        if output.attention is not None:
            out["attention"] = output.attention
        return out

    def ensemble_fetches(self, params_list: List[Any], batch: Dict[str, Any]) -> Dict:
        contexts = [Context(p, batch, train=False) for p in params_list]
        output = self.decoder.ensemble_search(contexts)
        return {"token_ids": output.token_ids,
                "scores": output.scores,
                "lengths": output.lengths}

    def collect_results(self, fetched: Dict[str, Any], num_examples: int) -> ExecutionResult:
        ids = np.asarray(fetched["token_ids"])[:num_examples]
        picked = ids[:, self.rank - 1, :]  # best-first sorted
        sentences = self.decoder.vocabulary.vectors_to_sentences(picked)
        if self.postprocess is not None:
            sentences = self.postprocess(sentences)
        scores = np.asarray(fetched["scores"])[:num_examples,
                                               self.rank - 1]
        aux = None
        if "attention" in fetched:
            # (B, K, T_out, T_src) -> the rank-th hypothesis's matrix,
            # trimmed to its emitted length
            att = np.asarray(fetched["attention"])[:num_examples,
                                                   self.rank - 1]
            lengths = np.asarray(fetched["lengths"])[:num_examples,
                                                     self.rank - 1]
            aux = {"attention": [m[:int(l)] if int(l) > 0 else m
                                 for m, l in zip(att, lengths)]}
        return ExecutionResult(
            outputs=sentences,
            losses={"beam_score": float(np.mean(scores))},
            size=num_examples, aux=aux)
