"""--grid sliding-window decoding (reference nm/run.py grid decode)."""

import os

import numpy as np
import pytest

from neuralmonkey_tpu.run import _grid_windows, grid_decode

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


@pytest.mark.parametrize("length,window", [
    (5, 8), (8, 8), (9, 8), (16, 8), (17, 8), (23, 6), (100, 7),
    (1, 1), (3, 2)])
def test_grid_windows_cover_exactly(length, window):
    spans = _grid_windows(length, window)
    claimed = []
    for start, end, claim_start, claim_end in spans:
        assert 0 <= start <= claim_start <= claim_end <= end <= length
        assert end - start <= window
        claimed.extend(range(claim_start, claim_end))
    # every position claimed exactly once, in order
    assert claimed == list(range(length))


def test_grid_decode_labeler(tmp_path):
    """A labeler with max_input_len=6 decodes 14-token sentences via
    overlapping windows; outputs stay token-aligned."""
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.experiment import Experiment

    out = str(tmp_path / "grid_exp")
    exp = Experiment(
        os.path.join(CONFIG_DIR, "labeler.ini"), train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=2",
                        "encoder.max_input_len=6"])
    exp.train()

    rng = np.random.RandomState(0)
    words = ["vier", "fünf", "acht", "null", "sieben", "drei"]
    long_sentences = [
        [words[rng.randint(len(words))] for _ in range(n)]
        for n in (14, 3, 9)]
    out_file = str(tmp_path / "tags.out")
    ds = Dataset("long", {"source": long_sentences},
                 outputs={"tags": out_file})
    grid_decode(exp, ds)
    lines = open(out_file).read().splitlines()
    assert len(lines) == 3
    for sent, line in zip(long_sentences, lines):
        assert len(line.split()) == len(sent)
