"""Convergence quality gates (VERDICT r1 item 3).

The earlier integration floors ("loss decreased", "beam >= greedy-10
BLEU") pass for a correct-but-garbage decoder. These gates train the
milestone-2 RNN model to convergence on the toy digit-word corpus — a
deterministic word-for-word translation task — and assert ABSOLUTE
BLEU: near-memorization on a training sample, a real floor on val, and
beam-vs-greedy within a point. Measured values are recorded in
BASELINE.md as the standing substitute for the unreachable TF1
reference-parity metric.
"""

import os

import pytest

from neuralmonkey_tpu.dataset import load_dataset_from_files
from neuralmonkey_tpu.evaluators.bleu import BLEU
from neuralmonkey_tpu.experiment import Experiment

CONFIG = os.path.join(os.path.dirname(__file__), "configs",
                      "beamsearch.ini")
DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def converged(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quality_exp"))
    exp = Experiment(
        CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=20",
                        "main.validation_period=5000",
                        "main.logging_period=100",
                        "encoder.dropout_keep_prob=1.0",
                        "decoder.dropout_keep_prob=1.0"])
    exp.train()
    return exp


def _decode_bleu(exp, src_path, ref_path, limit=None):
    ds = load_dataset_from_files(name="q", s_source=src_path,
                                 s_target=ref_path)
    _, outputs = exp.run_model(ds)
    refs = list(ds.get_series("target"))
    n = limit or len(refs)
    return {series: BLEU(outputs[series][:n], refs[:n])
            for series in ("target", "target_beam")}


@pytest.fixture(scope="module")
def train_scores(converged):
    return _decode_bleu(converged, os.path.join(DATA, "train.en"),
                        os.path.join(DATA, "train.de"), limit=100)


@pytest.fixture(scope="module")
def val_scores(converged):
    return _decode_bleu(converged, os.path.join(DATA, "val.en"),
                        os.path.join(DATA, "val.de"))


def test_training_sample_memorization(train_scores):
    """A converged model must approach memorization of its own
    training data on this deterministic task."""
    assert train_scores["target"] > 95.0, train_scores


def test_validation_floor(val_scores):
    assert val_scores["target"] > 90.0, val_scores


def test_beam_matches_greedy_quality(val_scores):
    """Beam=10 with length norm must be at least as good as greedy
    (up to a one-point tie tolerance), not 'within 10 BLEU'."""
    assert val_scores["target_beam"] >= val_scores["target"] - 1.0, \
        val_scores


def test_beam_absolute_floor(val_scores):
    assert val_scores["target_beam"] > 90.0, val_scores
