"""Processor tests: BPE roundtrip, char-based, editops."""

from neuralmonkey_tpu.processors.bpe import (BPEPostprocessor,
                                             BPEPreprocessor, learn_bpe,
                                             save_merges)
from neuralmonkey_tpu.processors.editops import (convert_to_edits,
                                                 reconstruct)
from neuralmonkey_tpu.processors.helpers import (pipeline,
                                                 postprocess_char_based,
                                                 preprocess_char_based,
                                                 untruecase)

CORPUS = [
    "the quick brown fox jumps over the lazy dog".split(),
    "the quicker the better".split(),
    "low lower lowest".split(),
] * 5


def test_bpe_roundtrip(tmp_path):
    merges = learn_bpe(CORPUS, num_merges=50, min_frequency=2)
    assert merges
    path = str(tmp_path / "merges.bpe")
    save_merges(merges, path)
    pre = BPEPreprocessor(merge_file=path)
    post = BPEPostprocessor()
    for sent in CORPUS:
        encoded = pre(sent)
        # all subwords of a word carry the separator except the last
        decoded = post([encoded])[0]
        assert decoded == sent


def test_bpe_splits_unseen_words(tmp_path):
    merges = learn_bpe(CORPUS, num_merges=10, min_frequency=2)
    path = str(tmp_path / "merges.bpe")
    save_merges(merges, path)
    pre = BPEPreprocessor(merge_file=path)
    encoded = pre(["überraschung"])
    assert len(encoded) > 1
    post = BPEPostprocessor()
    assert post([encoded])[0] == ["überraschung"]


def test_char_based_roundtrip():
    sent = "hello world".split()
    chars = preprocess_char_based(sent)
    assert "<space>" in chars
    assert postprocess_char_based([chars])[0] == sent


def test_untruecase():
    assert untruecase([["hello", "world"]])[0][0] == "Hello"


def test_pipeline():
    proc = pipeline([lambda s: [t.lower() for t in s],
                     lambda s: [t + "!" for t in s]])
    assert proc(["A"]) == ["a!"]


def test_editops_roundtrip():
    source = "the cat sat on the mat".split()
    target = "a cat sat on that mat".split()
    edits = convert_to_edits(source, target)
    assert reconstruct(source, edits) == target


def test_editops_identity():
    source = "a b c".split()
    edits = convert_to_edits(source, source)
    assert edits == ["<keep>"] * 3
    assert reconstruct(source, edits) == source
