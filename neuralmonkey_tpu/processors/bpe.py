"""Byte-pair-encoding pre/post-processors.

Rebuild of reference nm/processors/bpe.py. The reference wrapped
``subword_nmt.apply_bpe``; this is a native implementation of the same
algorithm (Sennrich et al. 2016, merge-file format compatible with
subword-nmt, including the ``#version:`` header and ``</w>`` end-of-word
handling), so existing merge files work unchanged and outputs match.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..logging import log


class BPECodec:
    """Applies a learned BPE merge table to tokenized words."""

    def __init__(self, merge_file: str, separator: str = "@@",
                 encoding: str = "utf-8") -> None:
        self.separator = separator
        self.version = (0, 1)
        self.bpe_codes: Dict[Tuple[str, str], int] = {}
        with open(merge_file, encoding=encoding) as f:
            first = f.readline()
            if first.startswith("#version:"):
                ver = first.strip().split(":")[1].strip()
                self.version = tuple(int(x) for x in ver.split("."))
            else:
                self._add_code(first)
            for line in f:
                self._add_code(line)
        self._cache: Dict[str, List[str]] = {}
        # native fast path (C++ codec, byte-exact — see native/):
        # built lazily so merely loading a merge file never compiles
        self._native = None
        self._native_failed = False
        log(f"BPE codes loaded from {merge_file} "
            f"({len(self.bpe_codes)} merges, v{self.version})")

    def _native_codec(self):
        if self._native is None and not self._native_failed:
            from ..native import NativeBPE, available
            if available():
                self._native = NativeBPE(self.bpe_codes,
                                         self.separator, self.version)
            else:
                self._native_failed = True
        return self._native

    def _add_code(self, line: str) -> None:
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            return
        parts = line.split()
        if len(parts) >= 2:
            pair = (parts[0], parts[1])
            if pair not in self.bpe_codes:
                self.bpe_codes[pair] = len(self.bpe_codes)

    def _encode_word(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        if not word:
            return []
        if self.version >= (0, 2):
            symbols = list(word[:-1]) + [word[-1] + "</w>"]
        else:
            symbols = list(word) + ["</w>"]

        while len(symbols) > 1:
            pairs = [(self.bpe_codes.get((symbols[i], symbols[i + 1]),
                                         float("inf")), i)
                     for i in range(len(symbols) - 1)]
            best_rank, best_i = min(pairs)
            if best_rank == float("inf"):
                break
            first, second = symbols[best_i], symbols[best_i + 1]
            merged = first + second
            new_symbols: List[str] = []
            i = 0
            while i < len(symbols):
                if (i < len(symbols) - 1 and symbols[i] == first
                        and symbols[i + 1] == second):
                    new_symbols.append(merged)
                    i += 2
                else:
                    new_symbols.append(symbols[i])
                    i += 1
            symbols = new_symbols

        # strip the end-of-word marker
        if symbols[-1] == "</w>":
            symbols = symbols[:-1]
        elif symbols[-1].endswith("</w>"):
            symbols = symbols[:-1] + [symbols[-1][: -len("</w>")]]
        out = [s + self.separator for s in symbols[:-1]] + [symbols[-1]]
        self._cache[word] = out
        return out

    def encode(self, sentence: List[str]) -> List[str]:
        # Python's per-word cache stays in front (Zipf: most words are
        # cache hits, and a dict hit beats the FFI round-trip); the
        # sentence's cache MISSES go through the native codec in one
        # batched call, where the merge loop dominates (~5x the Python
        # loop cold, tests/test_native.py)
        cache = self._cache
        misses = [w for w in sentence if w and w not in cache]
        if misses:
            native = self._native_codec()
            if native is not None:
                unique = [w for w in dict.fromkeys(misses)
                          if native.word_clean(w)]
                if unique:
                    for w, subs in zip(unique,
                                       native.encode_words(unique)):
                        cache[w] = subs
        output: List[str] = []
        for word in sentence:
            subwords = cache.get(word)
            if subwords is None:
                subwords = self._encode_word(word)
            output.extend(subwords)
        return output

    def decode(self, sentence: List[str]) -> List[str]:
        output: List[str] = []
        joining = False
        for token in sentence:
            ends_joined = token.endswith(self.separator)
            core = token[: -len(self.separator)] if ends_joined else token
            if joining and output:
                output[-1] += core
            else:
                output.append(core)
            joining = ends_joined
        return output


class BPEPreprocessor:
    """Config-visible preprocessor: tokens -> BPE subwords."""

    def __init__(self, merge_file: str, separator: str = "@@",
                 encoding: str = "utf-8") -> None:
        self.codec = BPECodec(merge_file, separator, encoding)

    def __call__(self, sentence: List[str]) -> List[str]:
        return self.codec.encode(sentence)


class BPEPostprocessor:
    """Config-visible postprocessor: BPE subwords -> tokens.

    Called per-batch in the reference (list of sentences)."""

    def __init__(self, separator: str = "@@") -> None:
        self.separator = separator

    def decode(self, sentence: List[str]) -> List[str]:
        output: List[str] = []
        joining = False
        for token in sentence:
            ends_joined = token.endswith(self.separator)
            core = token[: -len(self.separator)] if ends_joined else token
            if joining and output:
                output[-1] += core
            else:
                output.append(core)
            joining = ends_joined
        return output

    def __call__(self, decoded_sentences: List[List[str]]
                 ) -> List[List[str]]:
        return [self.decode(s) for s in decoded_sentences]


def learn_bpe(sentences, num_merges: int, min_frequency: int = 2
              ) -> List[Tuple[str, str]]:
    """Learn a BPE merge table (subword-nmt algorithm) — utility for
    building merge files without network access."""
    from collections import Counter
    vocab: Counter = Counter()
    for sent in sentences:
        for word in sent:
            vocab[word] += 1
    words = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): c
             for w, c in vocab.items() if w}
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for symbols, count in words.items():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += count
        if not pairs:
            break
        best, freq = pairs.most_common(1)[0]
        if freq < min_frequency:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for symbols, count in words.items():
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if (i < len(symbols) - 1 and symbols[i] == best[0]
                        and symbols[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_words[tuple(out)] = count
        words = new_words
    return merges


def save_merges(merges: List[Tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
