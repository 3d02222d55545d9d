"""External-tool evaluator wrappers (reference nm/evaluators/beer.py,
multeval.py): run a scoring tool as a subprocess over temp files."""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import List, Sequence

from .evaluator import Evaluator


class ExternalEvaluator(Evaluator):
    """Runs ``command <hyp_file> <ref_file>`` and parses a float from
    the last line of stdout."""

    def __init__(self, command: str, name: str = None,
                 encoding: str = "utf-8") -> None:
        super().__init__(name if name is not None else "External")
        self.command = command
        self.encoding = encoding

    def serialize(self, sentences: Sequence[List[str]], path: str) -> None:
        with open(path, "w", encoding=self.encoding) as f:
            for sent in sentences:
                f.write(" ".join(sent) + "\n")

    def __call__(self, hypotheses: Sequence[List[str]],
                 references: Sequence[List[str]]) -> float:
        with tempfile.TemporaryDirectory() as tmp:
            hyp_path = os.path.join(tmp, "hyp.txt")
            ref_path = os.path.join(tmp, "ref.txt")
            self.serialize(hypotheses, hyp_path)
            self.serialize(references, ref_path)
            result = subprocess.run(
                self.command.format(hyp=hyp_path, ref=ref_path),
                shell=True, capture_output=True, text=True, check=True)
            lines = [l for l in result.stdout.splitlines() if l.strip()]
            if not lines:
                raise RuntimeError(
                    f"External evaluator produced no output: {self.command}")
            return float(lines[-1].split()[-1])


class BeerWrapper(ExternalEvaluator):
    """BEER metric wrapper (reference nm/evaluators/beer.py)."""

    def __init__(self, wrapper: str, name: str = "BEER",
                 encoding: str = "utf-8") -> None:
        super().__init__(
            command=f"{wrapper} -s {{hyp}} -r {{ref}}",
            name=name, encoding=encoding)


class MultEvalWrapper(ExternalEvaluator):
    """MultEval wrapper (reference nm/evaluators/multeval.py)."""

    def __init__(self, wrapper: str, name: str = "MultEval",
                 encoding: str = "utf-8", metric: str = "bleu",
                 language: str = "en") -> None:
        super().__init__(
            command=(f"{wrapper} eval --refs {{ref}} --hyps-baseline "
                     f"{{hyp}} --meteor.language {language}"),
            name=f"{name}_{metric}", encoding=encoding)
        self.metric = metric
