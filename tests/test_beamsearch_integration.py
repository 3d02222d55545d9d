"""Integration: beam-search INI trains + beam runner validates + run
with two checkpoints = ensemble (milestone config 2)."""

import json
import os

import pytest

from neuralmonkey_tpu.dataset import load_dataset_from_files
from neuralmonkey_tpu.experiment import Experiment

CONFIG = os.path.join(os.path.dirname(__file__), "configs",
                      "beamsearch.ini")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("beam_exp"))
    exp = Experiment(
        CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=2",
                        "main.validation_period=30",
                        "bs_decoder.beam_size=5",
                        "encoder.dropout_keep_prob=1.0",
                        "decoder.dropout_keep_prob=1.0"])
    exp.train()
    return exp, out


def test_beam_metrics_validated(trained):
    _, out = trained
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    val = [r for r in records if r["kind"] == "val"]
    assert val
    last = val[-1]
    assert "target_beam/BLEU-4" in last
    assert "target/BLEU-4" in last
    assert "beam_score" in last


def test_beam_at_least_close_to_greedy(trained):
    """Beam output should not be drastically worse than greedy even
    this early in training (2 epochs; the converged-quality contract
    lives in tests/test_quality_gates.py, which asserts absolute BLEU
    and beam >= greedy - 1)."""
    _, out = trained
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    last = [r for r in records if r["kind"] == "val"][-1]
    assert last["target_beam/BLEU-4"] >= last["target/BLEU-4"] - 5.0


def test_checkpoint_ensembling(trained):
    """Restoring two checkpoints must run the ensemble path and decode
    valid sentences."""
    exp, out = trained
    ckpts = sorted(
        os.path.join(out, f) for f in os.listdir(out)
        if f.startswith("variables.data-") and not f.endswith(".json"))
    assert ckpts, "no checkpoints saved"
    paths = [ckpts[-1], ckpts[0]] if len(ckpts) > 1 \
        else [ckpts[-1], ckpts[-1]]
    exp.restore_variables(paths)
    assert len(exp.tf_manager.params_list) == 2
    ds = load_dataset_from_files(
        name="test", s_source="tests/data/test.en",
        s_target="tests/data/test.de")
    _, outputs = exp.run_model(ds)
    assert len(outputs["target_beam"]) == len(ds)
    assert any(len(s) > 0 for s in outputs["target_beam"])
