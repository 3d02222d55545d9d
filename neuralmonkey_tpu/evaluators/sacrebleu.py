"""SacreBLEU wrapper (reference nm/evaluators/sacrebleu.py).

Uses the ``sacrebleu`` package when available; otherwise falls back to
the in-repo corpus BLEU on detokenized text (gated import — no hard
dependency, per the environment's no-install rule).
"""

from __future__ import annotations

from typing import List, Sequence

from .bleu import BLEUEvaluator
from .evaluator import Evaluator

try:
    import sacrebleu as _sacrebleu  # type: ignore
    _HAS_SACREBLEU = True
except ImportError:
    _HAS_SACREBLEU = False


class SacreBLEUEvaluator(Evaluator):

    def __init__(self, name: str = None, smooth_method: str = "exp",
                 smooth_value: float = 0.0, force: bool = False,
                 lowercase: bool = False, tokenize: str = "13a",
                 use_effective_order: bool = False) -> None:
        super().__init__(name if name is not None else "SacreBLEU")
        self.smooth_method = smooth_method
        self.smooth_value = smooth_value
        self.force = force
        self.lowercase = lowercase
        self.tokenize = tokenize
        self.use_effective_order = use_effective_order
        self._fallback = BLEUEvaluator(name="BLEU-fallback")

    def __call__(self, hypotheses: Sequence[List[str]],
                 references: Sequence[List[str]]) -> float:
        if not _HAS_SACREBLEU:
            return self._fallback(hypotheses, references)
        hyp_strs = [" ".join(h) for h in hypotheses]
        ref_strs = [" ".join(r) for r in references]
        score = _sacrebleu.corpus_bleu(
            hyp_strs, [ref_strs],
            smooth_method=self.smooth_method,
            smooth_value=self.smooth_value or None,
            force=self.force, lowercase=self.lowercase,
            tokenize=self.tokenize,
            use_effective_order=self.use_effective_order)
        return score.score


SacreBLEU = SacreBLEUEvaluator()
