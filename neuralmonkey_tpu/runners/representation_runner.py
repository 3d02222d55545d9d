"""Representation runner (reference nm/runners/representation_runner.py):
dump encoder output vectors (sentence embeddings)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..model.part import Context
from .base_runner import BaseRunner, ExecutionResult


class RepresentationRunner(BaseRunner):

    def __init__(self, output_series: str, encoder,
                 used_session: int = 0) -> None:
        super().__init__(output_series, encoder)
        del used_session  # single-process; kept for config parity
        self.encoder = encoder

    @property
    def all_parts(self):
        return [self.encoder]

    def fetches(self, ctx: Context) -> Dict:
        return {"representation": self.encoder.output(ctx)}

    def collect_results(self, fetched: Dict[str, Any], num_examples: int) -> ExecutionResult:
        vectors = np.asarray(
            fetched["representation"])[:num_examples]
        return ExecutionResult(
            outputs=[v for v in vectors], losses={},
            size=num_examples)
