"""Greedy runner (reference nm/runners/runner.py): on-device greedy
decode, ids -> tokens on host, optional postprocess."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ..model.part import Context
from .base_runner import BaseRunner, ExecutionResult


class GreedyRunner(BaseRunner):

    def __init__(self, output_series: str, decoder,
                 postprocess: Callable = None) -> None:
        super().__init__(output_series, decoder)
        self.postprocess = postprocess

    @property
    def loss_names(self) -> List[str]:
        return ["train_xent", "runtime_xent"]

    def fetches(self, ctx: Context) -> Dict:
        out = {"decoded": self.decoder.decoded(ctx)}
        # losses only when the batch carries reference targets
        if self.decoder.target_ids_key in ctx.batch:
            out["train_xent"] = self.decoder.train_loss(ctx)
            out["runtime_xent"] = self.decoder.runtime_loss(ctx)
        return out

    def ensemble_fetches(self, params_list, batch) -> Dict:
        """K restored checkpoints => average distributions per step
        inside one jit (reference multi-session ensembling)."""
        contexts = [Context(p, batch, train=False)
                    for p in params_list]
        _, decoded = self.decoder.ensemble_greedy_outputs(contexts)
        return {"decoded": decoded}

    def collect_results(self, fetched, num_examples) -> ExecutionResult:
        ids = np.asarray(fetched["decoded"])[:num_examples]
        sentences = self.decoder.vocabulary.vectors_to_sentences(ids)
        if self.postprocess is not None:
            sentences = self.postprocess(sentences)
        losses = {}
        for name in ("train_xent", "runtime_xent"):
            if name in fetched:
                losses[name] = float(fetched[name])
        return ExecutionResult(outputs=sentences, losses=losses,
                               size=num_examples)


# Reference also exports this under the module path runners.runner
PlainRunner = GreedyRunner
