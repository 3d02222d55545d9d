"""MultEval evaluator (reference nm/evaluators/multeval.py):
module-path parity re-export; the subprocess wrapper lives in
external.py with the other external-tool evaluators."""

from .external import MultEvalWrapper

__all__ = ["MultEvalWrapper"]
