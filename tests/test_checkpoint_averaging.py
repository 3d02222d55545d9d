"""Checkpoint averaging + new vocabulary factory tests."""

import numpy as np

from neuralmonkey_tpu.utils.average_checkpoints import (
    average_checkpoints, average_flat)
from neuralmonkey_tpu.utils.saving import load_flat, save_tree


def test_average_flat():
    a = {"x/w": np.ones((2, 2)), "y": np.zeros((3,))}
    b = {"x/w": 3 * np.ones((2, 2)), "y": np.ones((3,))}
    avg = average_flat([a, b])
    np.testing.assert_allclose(avg["x/w"], 2.0)
    np.testing.assert_allclose(avg["y"], 0.5)


def test_average_checkpoints_roundtrip(tmp_path):
    tree1 = {"part": {"w": np.ones((4,)), "b": np.zeros((2,))}}
    tree2 = {"part": {"w": 3 * np.ones((4,)), "b": np.ones((2,))}}
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    save_tree(p1, tree1)
    save_tree(p2, tree2)
    out = str(tmp_path / "avg.npz")
    average_checkpoints([p1, p2], out)
    flat = load_flat(out)
    np.testing.assert_allclose(flat["part/w"], 2.0)
    np.testing.assert_allclose(flat["part/b"], 0.5)


def test_vocab_from_bpe(tmp_path):
    merges = tmp_path / "m.bpe"
    merges.write_text("#version: 0.2\nt h\nth e</w>\n")
    from neuralmonkey_tpu.vocabulary import from_bpe
    vocab = from_bpe(str(merges))
    assert "th" in vocab
    assert "the" in vocab
    assert "th@@" in vocab
