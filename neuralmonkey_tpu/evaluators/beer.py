"""BEER evaluator (reference nm/evaluators/beer.py): module-path
parity re-export; the subprocess wrapper lives in external.py with
the other external-tool evaluators."""

from .external import BeerWrapper

__all__ = ["BeerWrapper"]
