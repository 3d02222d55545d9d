"""Perplexity runner (reference nm/runners/perplexity_runner.py):
per-sentence perplexities from teacher-forced xent."""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ..model.part import Context
from .base_runner import BaseRunner, ExecutionResult


class PerplexityRunner(BaseRunner):

    @property
    def loss_names(self) -> List[str]:
        return ["xents"]

    def fetches(self, ctx: Context) -> Dict:
        return {
            "xents": self.decoder.train_xents(ctx),
            "mask": ctx.batch[self.decoder.target_mask_key],
        }

    def collect_results(self, fetched: Dict[str, Any], num_examples: int) -> ExecutionResult:
        xents = np.asarray(fetched["xents"])[:num_examples]
        lengths = np.asarray(fetched["mask"])[:num_examples].sum(axis=1)
        perplexities = np.exp(xents / np.maximum(lengths, 1.0))
        mean_xent = float(np.mean(xents / np.maximum(lengths, 1.0)))
        return ExecutionResult(
            outputs=[float(p) for p in perplexities],
            losses={"xents": mean_xent},
            size=num_examples)
