"""Entity-level F1 over BIO tag sequences
(reference nm/evaluators/f1_bio.py)."""

from __future__ import annotations

from typing import List, Sequence, Set, Tuple

from .evaluator import Evaluator


def _chunks(tags: Sequence[str]) -> Set[Tuple[int, int, str]]:
    """Extract (start, end, type) entity spans from BIO tags."""
    spans = set()
    start = None
    etype = ""
    for i, tag in enumerate(tags):
        head = tag[0] if tag else "O"
        ttype = tag[2:] if len(tag) > 2 and tag[1] in "-_" else ""
        if head == "B" or (head == "I" and start is None) \
                or (head == "I" and start is not None and ttype != etype):
            if start is not None:
                spans.add((start, i, etype))
            start = i
            etype = ttype
        elif head == "O":
            if start is not None:
                spans.add((start, i, etype))
            start = None
    if start is not None:
        spans.add((start, len(tags), etype))
    return spans


class F1Evaluator(Evaluator):
    """Corpus-level entity F1."""

    def __call__(self, hypotheses: Sequence[List[str]],
                 references: Sequence[List[str]]) -> float:
        if len(hypotheses) != len(references):
            raise ValueError("Hypotheses and references differ in length")
        tp = 0
        hyp_total = 0
        ref_total = 0
        for hyp, ref in zip(hypotheses, references):
            hyp_spans = _chunks(hyp)
            ref_spans = _chunks(ref)
            tp += len(hyp_spans & ref_spans)
            hyp_total += len(hyp_spans)
            ref_total += len(ref_spans)
        if hyp_total == 0 or ref_total == 0:
            return 0.0
        precision = tp / hyp_total
        recall = tp / ref_total
        if precision + recall == 0.0:
            return 0.0
        return 2 * precision * recall / (precision + recall)


F1 = F1Evaluator(name="F1 measure")
BIOF1Score = F1
