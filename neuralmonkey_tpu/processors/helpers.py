"""Misc pre/postprocessors (reference nm/processors/helpers.py)."""

from __future__ import annotations

from typing import Callable, List


def preprocess_char_based(sentence: List[str]) -> List[str]:
    """Word tokens -> character tokens with `<space>` separators."""
    out: List[str] = []
    for i, word in enumerate(sentence):
        if i > 0:
            out.append("<space>")
        out.extend(word)
    return out


def postprocess_char_based(sentences: List[List[str]]) -> List[List[str]]:
    """Character tokens -> word tokens."""
    result = []
    for sentence in sentences:
        words: List[str] = []
        current = ""
        for tok in sentence:
            if tok == "<space>":
                if current:
                    words.append(current)
                current = ""
            else:
                current += tok
        if current:
            words.append(current)
        result.append(words)
    return result


def untruecase(sentences: List[List[str]]) -> List[List[str]]:
    """Uppercase the first letter of each sentence (postprocessor)."""
    result = []
    for sentence in sentences:
        if sentence:
            sentence = [sentence[0].capitalize()] + list(sentence[1:])
        result.append(sentence)
    return result


def lowercase(sentence: List[str]) -> List[str]:
    return [t.lower() for t in sentence]


def pipeline(processors: List[Callable]) -> Callable:
    """Compose single-sentence preprocessors left to right."""
    def composed(data):
        for proc in processors:
            data = proc(data)
        return data
    return composed
