"""Integration: Transformer + BPE + noam + delayed updates from an INI
(milestone config 3)."""

import json
import os

import pytest

from neuralmonkey_tpu.experiment import Experiment

CONFIG = os.path.join(os.path.dirname(__file__), "configs",
                      "transformer.ini")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("transformer_exp"))
    exp = Experiment(
        CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=3",
                        "main.validation_period=40"])
    exp.train()
    return exp, out


def test_transformer_trains(trained):
    _, out = trained
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert losses[-1] < losses[0]


def test_bpe_postprocess_applied(trained):
    """Validation outputs must be joined words, not BPE subwords."""
    _, out = trained
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    val = [r for r in records if r["kind"] == "val"]
    assert val
    assert "target/BLEU-4" in val[-1]
