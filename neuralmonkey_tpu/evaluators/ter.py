"""Translation Edit Rate (reference nm/evaluators/ter.py, which wrapped
the ``pyter`` library). Implemented natively with a tercom-style
greedy block-shift search, per Snover et al. (2006) and the tercom
tool's algorithm:

- a block may be shifted only if it exactly matches a contiguous
  reference span AND is currently misaligned (shifting a perfectly
  aligned block is prohibited);
- the shift destination is derived from the edit-distance alignment —
  the block lands at the hypothesis position aligned with its
  reference match (tercom's position map), not at arbitrary positions;
- the best shift per round is the one that most reduces the
  edit distance (ties: larger block, then shorter move), applied only
  while the reduction beats the shift's own cost of one edit;
- caps: block size <= 10 tokens, move distance <= 50 (tercom
  defaults).

Corpus score keeps pyter semantics (average of sentence TERs), since
that is what the reference's wrapper reported; tercom's corpus pooling
(total edits / total reference words) is available as
``corpus_ter``. Not byte-verified against the java tercom tool (not
available in this environment); the paper's worked example is a test
vector. Lower is better.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .edit_distance import levenshtein
from .evaluator import Evaluator

_MAX_SHIFT_SIZE = 10
_MAX_SHIFT_DIST = 50


def _alignment(hyp: List, ref: List) -> List[Optional[int]]:
    """Levenshtein backtrace: for each hyp index, the ref index it is
    aligned to (match or substitution), or None for an insertion."""
    rows = len(hyp) + 1
    cols = len(ref) + 1
    dist = [[0] * cols for _ in range(rows)]
    for i in range(rows):
        dist[i][0] = i
    for j in range(cols):
        dist[0][j] = j
    for i in range(1, rows):
        for j in range(1, cols):
            cost = 0 if hyp[i - 1] == ref[j - 1] else 1
            dist[i][j] = min(dist[i - 1][j] + 1,
                             dist[i][j - 1] + 1,
                             dist[i - 1][j - 1] + cost)
    align: List[Optional[int]] = [None] * len(hyp)
    i, j = len(hyp), len(ref)
    while i > 0 and j > 0:
        cost = 0 if hyp[i - 1] == ref[j - 1] else 1
        if dist[i][j] == dist[i - 1][j - 1] + cost:
            align[i - 1] = j - 1
            i -= 1
            j -= 1
        elif dist[i][j] == dist[i][j - 1] + 1:
            j -= 1  # deletion (ref word unmatched)
        else:
            align[i - 1] = None  # insertion
            i -= 1
    while i > 0:
        align[i - 1] = None
        i -= 1
    return align


def _ref_matches(ref: List) -> dict:
    """All reference n-gram spans up to the shift-size cap:
    tuple(tokens) -> list of start positions."""
    spans: dict = {}
    for size in range(1, min(_MAX_SHIFT_SIZE, len(ref)) + 1):
        for j in range(len(ref) - size + 1):
            spans.setdefault(tuple(ref[j:j + size]), []).append(j)
    return spans


def _find_shift(hyp: List, ref: List, base: int) -> Tuple[int, List]:
    """Find the tercom-style block shift of `hyp` that most reduces
    edit distance to `ref`. Returns (gain, shifted_hyp)."""
    align = _alignment(hyp, ref)
    # position map: for each ref index, the hyp index aligned to it
    # (or, for deleted ref words, where in hyp they would insert)
    ref_to_hyp: List[int] = [len(hyp)] * (len(ref) + 1)
    for h, r in enumerate(align):
        if r is not None:
            ref_to_hyp[r] = min(ref_to_hyp[r], h)
    for j in range(len(ref) - 1, -1, -1):
        if ref_to_hyp[j] == len(hyp):
            ref_to_hyp[j] = ref_to_hyp[j + 1]

    spans = _ref_matches(ref)
    best = (0, 0, 0)  # (gain, block size, -distance)
    best_hyp = hyp
    n = len(hyp)
    for size in range(1, min(_MAX_SHIFT_SIZE, n) + 1):
        for start in range(n - size + 1):
            block = tuple(hyp[start:start + size])
            targets = spans.get(block)
            if targets is None:
                continue
            aligned_to = align[start:start + size]
            for j in targets:
                # prohibit shifting a block already aligned exactly
                # onto this reference span
                if aligned_to == list(range(j, j + size)):
                    continue
                # two alignment anchors: land the block at the hyp
                # position aligned with the match's first ref word, or
                # just before the hyp word aligned with the ref word
                # following the match (robust when the alignment of
                # the block region itself is degenerate)
                for dest in {ref_to_hyp[j], ref_to_hyp[j + size]}:
                    if start <= dest <= start + size:
                        continue  # no-op move
                    if not 0 <= dest <= len(hyp):
                        continue
                    if abs(dest - start) > _MAX_SHIFT_DIST:
                        continue
                    rest = hyp[:start] + hyp[start + size:]
                    pos = dest if dest < start else dest - size
                    candidate = rest[:pos] + list(block) + rest[pos:]
                    gain = base - levenshtein(candidate, ref)
                    key = (gain, size, -abs(dest - start))
                    if gain > best[0] or (gain == best[0] and key > best):
                        best = key
                        best_hyp = candidate
    return best[0], best_hyp


def ter(hypothesis: Sequence, reference: Sequence) -> float:
    """Sentence-level TER: (shifts + edit distance) / reference length."""
    edits, ref_len = ter_edits(hypothesis, reference)
    return edits / ref_len if ref_len else (0.0 if not edits else 1.0)


def ter_edits(hypothesis: Sequence, reference: Sequence
              ) -> Tuple[int, int]:
    """Returns (total edits including shifts, reference length)."""
    hyp = list(hypothesis)
    ref = list(reference)
    if not ref:
        return (0 if not hyp else len(hyp)), 0
    edits = 0
    base = levenshtein(hyp, ref)
    # Greedily apply beneficial shifts, each costing one edit.
    while True:
        gain, shifted = _find_shift(hyp, ref, base)
        if gain <= 1:  # a shift must beat its own cost of 1
            break
        hyp = shifted
        base -= gain
        edits += 1
    return edits + base, len(ref)


def corpus_ter(hypotheses: Sequence[Sequence],
               references: Sequence[Sequence]) -> float:
    """Tercom corpus pooling: total edits / total reference words."""
    total_edits = 0
    total_len = 0
    for hyp, ref in zip(hypotheses, references):
        edits, ref_len = ter_edits(hyp, ref)
        total_edits += edits
        total_len += ref_len
    return total_edits / total_len if total_len else float(total_edits > 0)


class TEREvaluator(Evaluator):
    """Corpus TER = average of sentence TERs (pyter semantics)."""

    def score_instance(self, hypothesis: List[str],
                       reference: List[str]) -> float:
        return ter(hypothesis, reference)

    @staticmethod
    def compare_scores(score1: float, score2: float) -> int:
        return (score1 < score2) - (score1 > score2)


TER = TEREvaluator(name="TER")
