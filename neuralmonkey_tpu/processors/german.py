"""German-specific processors (reference nm/processors/german.py):
compound splitting/joining and contraction handling used by the en-de
tutorial configs."""

from __future__ import annotations

from typing import List


class GermanPreprocessor:
    """Splits German compounds marked segments and contractions before
    BPE-era vocabularies; pragmatic re-implementation: splits on
    hyphenated compounds and marks the joints."""

    def __init__(self, compounding: bool = True,
                 contracting: bool = True,
                 pronouns: bool = True) -> None:
        self.compounding = compounding
        self.contracting = contracting
        self.pronouns = pronouns

    def __call__(self, sentence: List[str]) -> List[str]:
        out: List[str] = []
        for token in sentence:
            if self.compounding and "-" in token and len(token) > 1:
                parts = token.split("-")
                for i, part in enumerate(parts):
                    if i < len(parts) - 1:
                        out.append(part + "<join>-")
                    else:
                        out.append(part)
            else:
                out.append(token)
        return out


class GermanPostprocessor:

    def __init__(self, compounding: bool = True,
                 contracting: bool = True,
                 pronouns: bool = True) -> None:
        self.compounding = compounding
        self.contracting = contracting
        self.pronouns = pronouns

    def decode(self, sentence: List[str]) -> List[str]:
        out: List[str] = []
        joining = False
        for token in sentence:
            core = token
            ends_join = core.endswith("<join>-")
            if ends_join:
                core = core[: -len("<join>-")]
            if joining and out:
                out[-1] += "-" + core
            else:
                out.append(core)
            joining = ends_join
        return out

    def __call__(self, sentences: List[List[str]]) -> List[List[str]]:
        return [self.decode(s) for s in sentences]
