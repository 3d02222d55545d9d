"""Vocabulary tests (mirrors reference test_vocabulary.py intent)."""

import numpy as np
import pytest

from neuralmonkey_tpu.vocabulary import (
    END_TOKEN_INDEX, PAD_TOKEN_INDEX, START_TOKEN_INDEX, UNK_TOKEN_INDEX,
    Vocabulary, from_wordlist)

CORPUS = [
    "the colorless ideas slept furiously".split(),
    "pooh slept all night".split(),
    "working class hero is something to be".split(),
]


@pytest.fixture
def vocab():
    v = Vocabulary()
    for sent in CORPUS:
        v.add_tokenized_text(sent)
    return v


def test_special_token_indices(vocab):
    assert vocab.get_word_index("<pad>") == PAD_TOKEN_INDEX == 0
    assert vocab.get_word_index("<s>") == START_TOKEN_INDEX == 1
    assert vocab.get_word_index("</s>") == END_TOKEN_INDEX == 2
    assert vocab.get_word_index("<unk>") == UNK_TOKEN_INDEX == 3


def test_unknown_word(vocab):
    assert vocab.get_word_index("jabberwocky") == UNK_TOKEN_INDEX


def test_roundtrip(vocab):
    ids, mask = vocab.sentences_to_tensor(CORPUS, add_end_symbol=True)
    assert ids.shape == mask.shape
    assert ids.shape[0] == 3
    back = vocab.vectors_to_sentences(ids)
    assert back == CORPUS


def test_padding_and_mask(vocab):
    ids, mask = vocab.sentences_to_tensor(CORPUS, add_end_symbol=True)
    lengths = [len(s) + 1 for s in CORPUS]  # +1 for </s>
    assert ids.shape[1] == max(lengths)
    for b, length in enumerate(lengths):
        assert mask[b, :length].sum() == length
        assert mask[b, length:].sum() == 0
        assert (ids[b, length:] == PAD_TOKEN_INDEX).all()
        assert ids[b, length - 1] == END_TOKEN_INDEX


def test_max_len_truncation(vocab):
    ids, _ = vocab.sentences_to_tensor(CORPUS, max_len=3,
                                       add_end_symbol=True)
    assert ids.shape[1] == 4  # 3 tokens + </s>
    back = vocab.vectors_to_sentences(ids)
    assert back[0] == CORPUS[0][:3]


def test_start_symbol(vocab):
    ids, mask = vocab.sentences_to_tensor(
        CORPUS, add_start_symbol=True, add_end_symbol=True)
    assert (ids[:, 0] == START_TOKEN_INDEX).all()


def test_truncate(vocab):
    orig_len = len(vocab)
    vocab.truncate(6)
    assert len(vocab) == 6
    assert orig_len > 6
    # specials survive truncation
    assert vocab.get_word_index("<pad>") == 0


def test_wordlist_roundtrip(tmp_path, vocab):
    path = str(tmp_path / "vocab.txt")
    vocab.save_wordlist(path)
    loaded = from_wordlist(path)
    assert loaded.index_to_word == vocab.index_to_word


def test_weird_vectors_raise(vocab):
    with pytest.raises(ValueError):
        vocab.vectors_to_sentences(np.zeros((2, 3, 4)))


def test_min_freq():
    v = Vocabulary()
    v.add_word("often", 10)
    v.add_word("rare", 1)
    v.truncate_by_min_freq(2)
    assert "often" in v
    assert "rare" not in v
