"""Golden tests: native C++ host-pipeline kernels vs the Python
reference implementations (neuralmonkey_tpu/native/).

The native BPE codec and vocabulary encoder must be byte-exact with
processors/bpe.py and vocabulary.sentences_to_tensor — Python remains
the reference; C++ is the speed path the data pipeline dispatches to.
"""

import random

import numpy as np
import pytest

from neuralmonkey_tpu import native
from neuralmonkey_tpu.processors.bpe import (BPECodec, learn_bpe,
                                             save_merges)
from neuralmonkey_tpu.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library unavailable (no g++ or NM_NATIVE=0)")


def _random_corpus(seed, n=300, unicode_chars=False):
    rng = random.Random(seed)
    alphabet = "abcdefgh"
    if unicode_chars:
        alphabet += "äöüßčřžé日本語"
    return [[("".join(rng.choice(alphabet)
                      for _ in range(rng.randint(1, 10))))
             for _ in range(rng.randint(1, 12))]
            for _ in range(n)]


def _codec(tmp_path, corpus, version="0.2", separator="@@"):
    merges = learn_bpe(corpus, num_merges=60, min_frequency=1)
    path = str(tmp_path / f"merges_{version}.bpe")
    if version == "0.2":
        save_merges(merges, path)
    else:  # headerless v0.1 file
        with open(path, "w", encoding="utf-8") as f:
            for a, b in merges:
                f.write(f"{a} {b}\n")
    return BPECodec(path, separator=separator)


def _python_encode(codec, sentence):
    out = []
    for word in sentence:
        out.extend(codec._encode_word(word))
    return out


@pytest.mark.parametrize("version", ["0.1", "0.2"])
@pytest.mark.parametrize("unicode_chars", [False, True])
def test_native_bpe_matches_python(tmp_path, version, unicode_chars):
    """Every sentence of a random corpus (incl. multi-byte UTF-8
    characters — the C++ codec must split codepoints, not bytes)
    encodes identically through the native and Python codecs, under
    both merge-file versions (different end-of-word handling)."""
    corpus = _random_corpus(7, unicode_chars=unicode_chars)
    codec = _codec(tmp_path, corpus, version=version)
    assert codec._native_codec() is not None
    test_corpus = _random_corpus(8, unicode_chars=unicode_chars)
    for sentence in corpus[:100] + test_corpus[:100]:
        assert codec.encode(sentence) == _python_encode(codec, sentence)


def test_native_bpe_custom_separator_and_edge_words(tmp_path):
    corpus = _random_corpus(9)
    codec = _codec(tmp_path, corpus, separator="++")
    for sentence in ([], ["a"], ["ab"], [""],
                     ["aaaaaaaa", "h", "zzz", "abcdefgh"]):
        assert codec.encode(sentence) == _python_encode(codec, sentence)


def test_bpe_dirty_tokens_fall_back_to_python(tmp_path):
    """Tokens carrying the blob delimiters (space/newline) cannot ride
    the native batch protocol; the codec must detect them and produce
    the Python result."""
    corpus = _random_corpus(10)
    codec = _codec(tmp_path, corpus)
    weird = ["a b", "c\nd", "plain"]
    assert codec.encode(weird) == _python_encode(codec, weird)


def _rand_sentences(seed, vocab_words, n=64):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        length = rng.randint(0, 15)
        out.append([rng.choice(vocab_words) if rng.random() < 0.8
                    else f"oov{rng.randint(0, 99)}"
                    for _ in range(length)])
    return out


@pytest.mark.parametrize("kwargs", [
    {},
    {"add_start_symbol": True},
    {"add_end_symbol": True},
    {"add_start_symbol": True, "add_end_symbol": True},
    {"max_len": 5},
    {"max_len": 5, "add_end_symbol": True},
    {"max_len": 8, "pad_to_max_len": True, "add_start_symbol": True,
     "add_end_symbol": True},
    {"max_len": 0, "add_end_symbol": True},
])
def test_native_vocab_encode_matches_python(kwargs):
    """ids AND mask byte-equal between the native fill loop and the
    Python one across truncation/padding/special-symbol combos,
    including empty sentences, OOV tokens and delimiter-carrying /
    empty-string tokens (the count-mismatch fallback: Python encodes
    "" as <unk>, and space/newline tokens cannot ride the blob)."""
    vocab = Vocabulary()
    words = [f"w{i}" for i in range(50)] + ["ä", "日本", "é"]
    for w in words:
        vocab.add_word(w)
    sentences = _rand_sentences(3, words) + [[], ["w0"], [],
                                             ["", "w1", ""],
                                             ["a b"], ["c\nd"]]
    ids_n, mask_n = vocab.sentences_to_tensor(sentences, **kwargs)
    assert vocab._native is not None, "native path was not taken"
    vocab._native = None
    vocab._native_failed = True  # force the Python loop
    ids_p, mask_p = vocab.sentences_to_tensor(sentences, **kwargs)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_vocab_invalidated_on_mutation():
    """add_word/truncate must rebuild the native encoder — a stale
    handle would silently map new words to <unk>."""
    vocab = Vocabulary()
    vocab.add_word("hello")
    ids, _ = vocab.sentences_to_tensor([["hello"]])
    first = int(ids[0, 0])
    vocab.add_word("world")
    ids2, _ = vocab.sentences_to_tensor([["world"]])
    assert int(ids2[0, 0]) == first + 1  # not <unk>
    vocab.truncate(5)
    ids3, _ = vocab.sentences_to_tensor([["hello"]])
    assert int(ids3[0, 0]) >= 4  # still a real word id


def test_native_vocab_unk_sampling_stays_python():
    """train_mode with unk_sample_prob>0 must keep the Python loop
    (it draws from Python's random)."""
    vocab = Vocabulary(unk_sample_prob=0.5)
    vocab.add_word("rare")
    vocab.sentences_to_tensor([["rare"]], train_mode=True)
    assert vocab._native is None


def test_native_bpe_throughput_smoke(tmp_path):
    """Native BPE should not be slower than Python on a cold cache
    (informational; generous 1.0x floor to stay load-robust)."""
    import time
    corpus = _random_corpus(11, n=2000)
    codec = _codec(tmp_path, corpus)
    native_codec = codec._native_codec()
    assert native_codec is not None

    t0 = time.perf_counter()
    for s in corpus:
        native_codec.encode(s)
    t_native = time.perf_counter() - t0

    codec._cache.clear()
    t0 = time.perf_counter()
    for s in corpus:
        _python_encode(codec, s)
    t_python = time.perf_counter() - t0
    # cold-cache native re-run (cache warmed above) would be unfair;
    # report only — correctness is the other tests' job
    print(f"bpe encode: native {t_native:.3f}s python {t_python:.3f}s "
          f"({t_python / max(t_native, 1e-9):.1f}x)")
