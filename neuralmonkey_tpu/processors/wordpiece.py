"""Wordpiece pre/post-processing (reference nm/processors/wordpiece.py,
which wrapped the t2t SubwordTextEncoder).

Native implementation: greedy longest-match segmentation against a
Vocabulary, continuation pieces marked with the ``##`` prefix
(WordPiece convention); unknown characters fall back to ``<unk>``.
"""

from __future__ import annotations

from typing import List

from ..vocabulary import UNK_TOKEN, Vocabulary


class WordpiecePreprocessor:

    def __init__(self, vocabulary: Vocabulary,
                 max_subwords_per_word: int = 50) -> None:
        self.vocabulary = vocabulary
        self.max_subwords = max_subwords_per_word

    def _split_word(self, word: str) -> List[str]:
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while end > start:
                candidate = word[start:end]
                if start > 0:
                    candidate = "##" + candidate
                if candidate in self.vocabulary:
                    piece = candidate
                    break
                end -= 1
            if piece is None:
                return [UNK_TOKEN]
            pieces.append(piece)
            start = end
            if len(pieces) > self.max_subwords:
                return [UNK_TOKEN]
        return pieces

    def __call__(self, sentence: List[str]) -> List[str]:
        out: List[str] = []
        for word in sentence:
            out.extend(self._split_word(word))
        return out


class WordpiecePostprocessor:

    def __init__(self, preprocessor: WordpiecePreprocessor = None
                 ) -> None:
        del preprocessor  # config parity

    def decode(self, sentence: List[str]) -> List[str]:
        words: List[str] = []
        for piece in sentence:
            if piece.startswith("##") and words:
                words[-1] += piece[2:]
            else:
                words.append(piece)
        return words

    def __call__(self, sentences: List[List[str]]) -> List[List[str]]:
        return [self.decode(s) for s in sentences]


def build_wordpiece_vocabulary(sentences, max_size: int = 8000,
                               min_freq: int = 2) -> Vocabulary:
    """Build a wordpiece vocabulary: all characters + frequent whole
    words + frequent continuations learned BPE-style."""
    from collections import Counter
    from .bpe import learn_bpe

    vocab = Vocabulary()
    char_counter: Counter = Counter()
    for sent in sentences:
        for word in sent:
            for i, ch in enumerate(word):
                char_counter[ch if i == 0 else "##" + ch] += 1
    for ch, count in char_counter.most_common():
        vocab.add_word(ch, count)

    merges = learn_bpe(sentences, num_merges=max_size, min_frequency=min_freq)
    for a, b in merges:
        merged = (a + b).replace("</w>", "")
        if merged:
            vocab.add_word(merged)
            if "##" + merged not in vocab:
                vocab.add_word("##" + merged)
        if len(vocab) >= max_size:
            break
    return vocab
