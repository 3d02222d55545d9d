"""Sentence GLEU (reference nm/evaluators/gleu.py; Wu et al. 2016).

min(precision, recall) over n-grams 1..n — the reward used for RL/
self-critical training because it behaves well per-sentence.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence

from .evaluator import Evaluator


def _ngrams(tokens: Sequence[str], max_n: int) -> Counter:
    counts: Counter = Counter()
    for order in range(1, max_n + 1):
        for i in range(len(tokens) - order + 1):
            counts[tuple(tokens[i:i + order])] += 1
    return counts


def gleu_sentence(hypothesis: Sequence[str], reference: Sequence[str],
                  max_n: int = 4) -> float:
    hyp_counts = _ngrams(hypothesis, max_n)
    ref_counts = _ngrams(reference, max_n)
    overlap = sum((hyp_counts & ref_counts).values())
    hyp_total = sum(hyp_counts.values())
    ref_total = sum(ref_counts.values())
    if hyp_total == 0 or ref_total == 0:
        return 0.0
    return min(overlap / hyp_total, overlap / ref_total)


class GLEUEvaluator(Evaluator):

    def __init__(self, n: int = 4, deduplicate: bool = False,
                 name: str = None) -> None:
        super().__init__(name if name is not None else f"GLEU-{n}")
        self.n = n
        self.deduplicate = deduplicate

    def score_instance(self, hypothesis: List[str],
                       reference: List[str]) -> float:
        if self.deduplicate:
            out: List[str] = []
            for tok in hypothesis:
                if not out or out[-1] != tok:
                    out.append(tok)
            hypothesis = out
        return gleu_sentence(hypothesis, reference, self.n)


GLEU = GLEUEvaluator()
