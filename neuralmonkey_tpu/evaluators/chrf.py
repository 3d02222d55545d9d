"""chrF score (reference nm/evaluators/chrf.py; Popović 2015).

Character n-gram F-score: chrF_beta over n-grams 1..n (default 6),
computed corpus-level by averaging n-gram precisions/recalls over the
corpus, matching the reference implementation's semantics.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence

from .evaluator import Evaluator


def _char_ngrams(tokens: Sequence[str], order: int) -> Counter:
    text = " ".join(tokens)
    return Counter(text[i:i + order]
                   for i in range(len(text) - order + 1))


class ChrFEvaluator(Evaluator):

    def __init__(self, n: int = 6, beta: float = 1.0,
                 ignored_symbols: List[str] = None,
                 name: str = None) -> None:
        super().__init__(name if name is not None else "chrF3"
                         if beta == 3 else f"chrF{int(beta)}")
        self.n = n
        self.beta_2 = beta * beta
        self.ignored = ignored_symbols or []

    def _clean(self, tokens: Sequence[str]) -> List[str]:
        return [t for t in tokens if t not in self.ignored]

    def __call__(self, hypotheses: Sequence[List[str]],
                 references: Sequence[List[str]]) -> float:
        if len(hypotheses) != len(references):
            raise ValueError("Hypotheses and references differ in length")
        precisions = []
        recalls = []
        for order in range(1, self.n + 1):
            matched = 0
            hyp_total = 0
            ref_total = 0
            for hyp, ref in zip(hypotheses, references):
                hyp_counts = _char_ngrams(self._clean(hyp), order)
                ref_counts = _char_ngrams(self._clean(ref), order)
                matched += sum((hyp_counts & ref_counts).values())
                hyp_total += sum(hyp_counts.values())
                ref_total += sum(ref_counts.values())
            precisions.append(matched / hyp_total if hyp_total else 0.0)
            recalls.append(matched / ref_total if ref_total else 0.0)
        avg_p = sum(precisions) / len(precisions)
        avg_r = sum(recalls) / len(recalls)
        if avg_p + avg_r == 0.0:
            return 0.0
        return ((1 + self.beta_2) * avg_p * avg_r
                / (self.beta_2 * avg_p + avg_r))


ChrF3 = ChrFEvaluator(beta=3.0, name="chrF3")
ChrF = ChrFEvaluator(beta=1.0, name="chrF")
