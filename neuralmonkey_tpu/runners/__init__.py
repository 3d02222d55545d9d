"""Runners: inference/eval execution scripts
(reference nm/runners/, SURVEY.md §2 L5)."""

from .base_runner import BaseRunner, ExecutionResult
from .runner import GreedyRunner
