"""One INI per capability (the reference's integration-test strategy,
SURVEY.md §5): each must run to completion with decreasing loss and
produce sensible validation metrics."""

import json
import os

import pytest

from neuralmonkey_tpu.experiment import Experiment

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _train(config, out, extra=()):
    exp = Experiment(
        os.path.join(CONFIG_DIR, config), train_mode=True,
        config_changes=[f'main.output="{out}"',
                        "main.logging_period=10", *extra])
    exp.train()
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    train = [r for r in records if r["kind"] == "train"]
    val = [r for r in records if r["kind"] == "val"]
    assert train[-1]["loss"] < train[0]["loss"], "loss did not decrease"
    return exp, val


def test_labeler_ini(tmp_path):
    _, val = _train("labeler.ini", str(tmp_path / "lab"))
    assert val
    # parity tagging from word identity is learnable
    assert val[-1]["tags/Accuracy"] > 0.5


def test_classifier_ini(tmp_path):
    _, val = _train("classifier.ini", str(tmp_path / "cls"))
    assert val
    assert "label/AccuracySeqLevel" in val[-1]


def test_language_model_ini(tmp_path):
    _, val = _train("language_model.ini", str(tmp_path / "lm"))
    assert val
    assert "xents" in val[-1]
    assert val[-1]["xents"] > 0


def test_post_edit_ini(tmp_path):
    exp, val = _train("post_edit.ini", str(tmp_path / "pe"))
    assert val
    # reconstruction through edit ops + BLEU vs corrected reference;
    # keep-heavy toy data should reach a decent score quickly
    assert val[-1]["edits_out/BLEU-4"] > 10.0


def test_ctc_ini(tmp_path):
    """Speech: WAV -> log-mel -> BiRNN -> CTC loss, prefix-beam
    decoding; toy tone-to-word task must be clearly learnable."""
    _, val = _train("ctc.ini", str(tmp_path / "ctc"))
    assert val
    assert val[-1]["transcript/WER"] < 0.8


def test_regressor_ini(tmp_path):
    _, val = _train("regressor.ini", str(tmp_path / "reg"))
    assert val
    assert val[-1]["score/MSE"] < 0.01  # length/10 is linearly learnable


def test_alignment_ini(tmp_path):
    """Joint MT + alignment objective; attention matrices dumped by the
    WordAlignmentRunner."""
    _, val = _train("alignment.ini", str(tmp_path / "align"))
    assert val
    assert val[-1]["target/BLEU-4"] > 20.0


def test_factored_ini(tmp_path):
    _, val = _train("factored.ini", str(tmp_path / "fact"))
    assert val
    assert val[-1]["target/BLEU-4"] > 10.0


def test_flat_multiattention_ini(tmp_path):
    _, val = _train("flat_multiattention.ini", str(tmp_path / "flat"))
    assert val
    assert "target/BLEU-4" in val[-1]


def test_sentence_cnn_ini(tmp_path):
    _, val = _train("sentence_cnn.ini", str(tmp_path / "scnn"))
    assert val
    assert "target/BLEU-4" in val[-1]


def test_self_critical_ini(tmp_path):
    """REINFORCE with greedy baseline (self-critical) + xent warmup."""
    _, val = _train("self_critical.ini", str(tmp_path / "sc"))
    assert val
    assert val[-1]["target/GLEU-4"] > 0.05


def test_str_ini(tmp_path):
    """String-vector reader feeding a StatefulFiller."""
    _, val = _train("str.ini", str(tmp_path / "str"))
    assert val
    assert val[-1]["target/MSE"] < 2.0


def test_audio_classifier_ini(tmp_path):
    """Audio utterance classification: log-mel -> RawRNNEncoder ->
    Classifier (first tone of the utterance, 3 classes)."""
    _, val = _train("audio_classifier.ini", str(tmp_path / "ac"))
    assert val
    assert val[-1]["label/AccuracySeqLevel"] > 0.5


def test_vocab_ini(tmp_path):
    """vocabulary.from_wordlist (frequency wordlist file) end-to-end."""
    _, val = _train("vocab.ini", str(tmp_path / "vocab"))
    assert val
    assert "target/BLEU-4" in val[-1]


def test_moe_ini(tmp_path):
    """Mixture-of-experts transformer (ops/moe.py): router + 4 expert
    FFNs per layer, Switch balance loss folded into the objective."""
    _, val = _train("moe.ini", str(tmp_path / "moe"))
    assert val
    assert "target/BLEU-4" in val[-1]
