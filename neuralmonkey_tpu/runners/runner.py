"""Greedy runner (reference nm/runners/runner.py): on-device greedy
decode, ids -> tokens on host, optional postprocess."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..model.part import Context
from .base_runner import BaseRunner, ExecutionResult


class GreedyRunner(BaseRunner):

    def __init__(self, output_series: str, decoder,
                 postprocess: Callable = None,
                 visualize_attention: bool = False) -> None:
        super().__init__(output_series, decoder)
        self.postprocess = postprocess
        # fetch the decoder's attention histories alongside outputs;
        # the training loop writes them as PNG heatmaps on new-best
        # validations (the reference's attention image summaries)
        self.visualize_attention = visualize_attention

    @property
    def loss_names(self) -> List[str]:
        return ["train_xent", "runtime_xent"]

    def fetches(self, ctx: Context) -> Dict:
        # losses only when the batch carries reference targets; the
        # runtime loss runs the logits-stacking greedy scan, so reuse
        # its (memoized) ids rather than also running the lean
        # early-exit loop that plain decode uses
        wants_losses = self.decoder.target_ids_key in ctx.batch
        if wants_losses or self.visualize_attention:
            out = {"decoded": self.decoder.greedy_outputs(ctx)[1]}
        else:
            out = {"decoded": self.decoder.decoded(ctx)}
        if wants_losses:
            out["train_xent"] = self.decoder.train_loss(ctx)
            out["runtime_xent"] = self.decoder.runtime_loss(ctx)
        if self.visualize_attention:
            import jax.numpy as jnp
            _, _, aux = self.decoder.greedy_outputs(ctx)
            weights = aux.get("attention_weights", ()) \
                if isinstance(aux, dict) else ()
            if weights:
                # scan-stacked (T_out, B, T_src) -> (B, T_out, T_src)
                out["attention"] = jnp.swapaxes(weights[0], 0, 1)
        return out

    def ensemble_fetches(self, params_list: List[Any], batch: Dict[str, Any]) -> Dict:
        """K restored checkpoints => average distributions per step
        inside one jit (reference multi-session ensembling)."""
        contexts = [Context(p, batch, train=False)
                    for p in params_list]
        _, decoded = self.decoder.ensemble_greedy_outputs(contexts)
        return {"decoded": decoded}

    def collect_results(self, fetched: Dict[str, Any], num_examples: int) -> ExecutionResult:
        ids = np.asarray(fetched["decoded"])[:num_examples]
        sentences = self.decoder.vocabulary.vectors_to_sentences(ids)
        if self.postprocess is not None:
            sentences = self.postprocess(sentences)
        losses = {}
        for name in ("train_xent", "runtime_xent"):
            if name in fetched:
                losses[name] = float(fetched[name])
        aux = None
        if "attention" in fetched:
            aux = {"attention":
                   np.asarray(fetched["attention"])[:num_examples]}
        return ExecutionResult(outputs=sentences, losses=losses,
                               size=num_examples, aux=aux)


# Reference also exports this under the module path runners.runner
PlainRunner = GreedyRunner
