"""Translation Edit Rate (reference nm/evaluators/ter.py, which wrapped
the ``pyter`` library). Implemented natively: greedy block-shift search
plus Levenshtein, per Snover et al. (2006). Lower is better."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .edit_distance import levenshtein
from .evaluator import Evaluator

_MAX_SHIFT_SIZE = 10
_MAX_SHIFT_DIST = 50


def _find_shift(hyp: List, ref: List) -> Tuple[int, List]:
    """Find the single block shift of `hyp` that most reduces edit
    distance to `ref`. Returns (gain, shifted_hyp)."""
    base = levenshtein(hyp, ref)
    best_gain = 0
    best_hyp = hyp
    n = len(hyp)
    ref_ngrams = set()
    for size in range(1, min(_MAX_SHIFT_SIZE, len(ref)) + 1):
        for i in range(len(ref) - size + 1):
            ref_ngrams.add(tuple(ref[i:i + size]))
    for size in range(1, min(_MAX_SHIFT_SIZE, n) + 1):
        for start in range(n - size + 1):
            block = tuple(hyp[start:start + size])
            if block not in ref_ngrams:
                continue
            rest = hyp[:start] + hyp[start + size:]
            for pos in range(len(rest) + 1):
                if pos == start:
                    continue
                if abs(pos - start) > _MAX_SHIFT_DIST:
                    continue
                candidate = rest[:pos] + list(block) + rest[pos:]
                gain = base - levenshtein(candidate, ref)
                if gain > best_gain:
                    best_gain = gain
                    best_hyp = candidate
    return best_gain, best_hyp


def ter(hypothesis: Sequence, reference: Sequence) -> float:
    """Sentence-level TER."""
    hyp = list(hypothesis)
    ref = list(reference)
    if not ref:
        return 0.0 if not hyp else 1.0
    edits = 0
    # Greedily apply beneficial shifts, each costs one edit.
    while True:
        gain, shifted = _find_shift(hyp, ref)
        if gain <= 1:  # a shift must beat its own cost of 1
            break
        hyp = shifted
        edits += 1
    edits += levenshtein(hyp, ref)
    return edits / len(ref)


class TEREvaluator(Evaluator):
    """Corpus TER = average of sentence TERs (pyter semantics)."""

    def score_instance(self, hypothesis: List[str],
                       reference: List[str]) -> float:
        return ter(hypothesis, reference)

    @staticmethod
    def compare_scores(score1: float, score2: float) -> int:
        return (score1 < score2) - (score1 > score2)


TER = TEREvaluator(name="TER")
