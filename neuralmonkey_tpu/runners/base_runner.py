"""Runner protocol (reference nm/runners/base_runner.py).

A runner declares jittable *fetches* over a forward Context and a
host-side *collect* that turns fetched arrays into output series items.
The reference's ``Executable.next_to_execute``/``collect_results``
per-step protocol dissolves: decoding loops run on device, so one
fetch per batch suffices (SURVEY.md §8.1).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import numpy as np

from ..model.part import Context


class ExecutionResult(NamedTuple):
    """Per-batch result (reference's ExecutionResult)."""
    outputs: List[Any]                 # one item per example
    losses: Dict[str, float]          # name -> scalar (batch mean)
    size: int                          # number of real examples
    # optional extra fetched arrays (attention maps etc.)
    aux: Optional[Dict[str, np.ndarray]] = None


def reduce_execution_results(results: List[ExecutionResult]
                             ) -> ExecutionResult:
    """Concatenate outputs, size-weighted-average losses."""
    outputs: List[Any] = []
    total = 0
    loss_sums: Dict[str, float] = {}
    aux_items: Dict[str, List[np.ndarray]] = {}
    for result in results:
        outputs.extend(result.outputs)
        total += result.size
        for name, value in result.losses.items():
            loss_sums[name] = loss_sums.get(name, 0.0) \
                + float(value) * result.size
        for name, value in (result.aux or {}).items():
            aux_items.setdefault(name, []).append(value)
    losses = {name: value / max(total, 1)
              for name, value in loss_sums.items()}
    # aux arrays may have batch-dependent trailing shapes (bucketed
    # time axes); keep them as per-example lists
    aux = ({name: [row for chunk in chunks for row in chunk]
            for name, chunks in aux_items.items()}
           if aux_items else None)
    return ExecutionResult(outputs=outputs, losses=losses, size=total,
                           aux=aux)


class BaseRunner:
    """Base runner bound to one decoder-ish part."""

    def __init__(self, output_series: str, decoder) -> None:
        self.output_series = output_series
        self.decoder = decoder

    # parts reachable through this runner (for model collection)
    @property
    def all_parts(self):
        return [self.decoder]

    @property
    def loss_names(self) -> List[str]:
        return []

    def fetches(self, ctx: Context) -> Dict[str, Any]:
        """Jittable dict of arrays to fetch for one batch."""
        raise NotImplementedError

    def collect_results(self, fetched: Dict[str, np.ndarray],
                        num_examples: int) -> ExecutionResult:
        """Host-side: fetched numpy arrays -> outputs/losses."""
        raise NotImplementedError
