"""Integration: captioning (milestone 4) + hierarchical multimodal MT
(milestone 5) from unchanged-dialect INIs."""

import json
import os

import pytest

from neuralmonkey_tpu.experiment import Experiment

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _train(config, out, extra=()):
    exp = Experiment(
        os.path.join(CONFIG_DIR, config), train_mode=True,
        config_changes=[f'main.output="{out}"', *extra])
    exp.train()
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    return exp, records


def test_captioning(tmp_path):
    _, records = _train("captioning.ini", str(tmp_path / "cap"),
                        ["main.epochs=3", "main.logging_period=10"])
    losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert losses[-1] < losses[0]
    val = [r for r in records if r["kind"] == "val"]
    assert "caption/BLEU-4" in val[-1]
    # the toy captioning task is learnable: BLEU must move off zero
    assert val[-1]["caption/BLEU-4"] > 1.0


def test_multimodal_hierarchical(tmp_path):
    _, records = _train("hier_multimodal.ini", str(tmp_path / "mmt"),
                        ["main.epochs=2", "main.logging_period=10"])
    losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert losses[-1] < losses[0]
    val = [r for r in records if r["kind"] == "val"]
    assert "target/BLEU-4" in val[-1]
