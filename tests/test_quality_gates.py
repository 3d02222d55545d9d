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


# --- Transformer gate (milestone-3 config, VERDICT r1 item 3 "and the
# transformer INI"). The 300-sentence checked-in corpus is too small for
# a tiny transformer to generalize over repeated tokens (it plateaus at
# ~77 val BLEU while memorizing train at 100 — dropped duplicates like
# "vier vier" -> "vier"), so the gate synthesizes a larger deterministic
# corpus from the same digit-word task; measured 96.6 train-sample /
# 98.9 val BLEU at this budget (recorded in BASELINE.md).

TRANSFORMER_CONFIG = os.path.join(os.path.dirname(__file__), "configs",
                                  "transformer.ini")

# canonical corpus generator lives in bench.py so the hardware quality
# run (`bench.py --quality --model=transformer`) and this gate train on
# the exact same data without bench depending on test modules
import bench

_synthesize_corpus = bench.synthesize_digit_corpus


@pytest.fixture(scope="module")
def converged_transformer(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("quality_transformer_exp"))
    gen = str(tmp_path_factory.mktemp("quality_transformer_data"))
    src, tgt = _synthesize_corpus(gen)
    exp = Experiment(
        TRANSFORMER_CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=14",
                        "main.validation_period=50000",
                        "main.logging_period=400",
                        f'train_data.s_source="{src}"',
                        f'train_data.s_target="{tgt}"',
                        "encoder.dropout_keep_prob=1.0",
                        "decoder.dropout_keep_prob=1.0"])
    exp.train()
    return exp, src, tgt


def _decode_bleu_bpe(exp, src_path, ref_path, limit=None):
    from neuralmonkey_tpu.processors.bpe import BPEPreprocessor
    bpe = BPEPreprocessor(merge_file=os.path.join(DATA, "merges.bpe"))
    ds = load_dataset_from_files(
        name="q", s_source=src_path, s_target=ref_path,
        preprocessors=[("source", "source_bpe", bpe),
                       ("target", "target_bpe", bpe)])
    _, outputs = exp.run_model(ds)
    refs = list(ds.get_series("target"))
    n = limit or len(refs)
    return BLEU(outputs["target"][:n], refs[:n])


def test_transformer_training_sample_memorization(converged_transformer):
    exp, src, tgt = converged_transformer
    assert _decode_bleu_bpe(exp, src, tgt, limit=100) > 90.0


def test_transformer_validation_floor(converged_transformer):
    """Held-out digit sentences (the checked-in val set) must decode
    near-perfectly — in particular, repeated source tokens must not be
    collapsed (the failure mode of the undertrained model)."""
    exp, _, _ = converged_transformer
    score = _decode_bleu_bpe(exp, os.path.join(DATA, "val.en"),
                             os.path.join(DATA, "val.de"))
    assert score > 90.0, score
