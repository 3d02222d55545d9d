"""Evaluation metrics (reference nm/evaluators/, SURVEY.md §3.1).

An evaluator is a callable ``(decoded, references) -> float`` with a
``name`` and a ``compare_scores(a, b)`` direction method. Instances with
the reference's config names (``BLEU``, ``TER`` …) are exported from the
matching modules.
"""

from .evaluator import Evaluator, SequenceEvaluator
