"""Evaluator tests (mirrors reference test_bleu.py / test_ter.py /
test_eval_wrappers.py intent)."""

import pytest

from neuralmonkey_tpu.evaluators.accuracy import Accuracy, AccuracySeqLevel
from neuralmonkey_tpu.evaluators.bleu import BLEU, BLEUEvaluator
from neuralmonkey_tpu.evaluators.chrf import ChrF3
from neuralmonkey_tpu.evaluators.edit_distance import (EditDistance,
                                                       levenshtein)
from neuralmonkey_tpu.evaluators.f1_bio import F1
from neuralmonkey_tpu.evaluators.gleu import GLEU
from neuralmonkey_tpu.evaluators.mse import MSE
from neuralmonkey_tpu.evaluators.ter import TER
from neuralmonkey_tpu.evaluators.wer import WER

HYP = ["the cat is on the mat".split(),
       "a dog sleeps".split()]
REF_SAME = [list(s) for s in HYP]
REF_DIFF = ["the cat sat on the mat".split(),
            "the dog sleeps well".split()]
REF_EMPTY_HYP = [[], []]


def test_bleu_perfect():
    assert BLEU(HYP, REF_SAME) == pytest.approx(100.0)


def test_bleu_imperfect():
    score = BLEU(HYP, REF_DIFF)
    assert 0.0 < score < 100.0


def test_bleu_empty_hyp():
    assert BLEU(REF_EMPTY_HYP, REF_DIFF) == 0.0


def test_bleu_length_mismatch():
    with pytest.raises(ValueError):
        BLEU(HYP, REF_DIFF[:1])


def test_bleu_deduplicate():
    dedup = BLEUEvaluator(deduplicate=True)
    score = dedup([["a", "a", "b", "b"]], [["a", "b"]])
    assert score == pytest.approx(100.0)


def test_bleu_multiple_references():
    ev = BLEUEvaluator(multiple_references_separator="|||")
    score = ev([["a", "b"]], [["x", "y", "|||", "a", "b"]])
    assert score == pytest.approx(100.0)


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], ["a"]) == 1
    assert levenshtein(["a", "b"], ["a", "b"]) == 0


def test_wer():
    assert WER(HYP, REF_SAME) == 0.0
    assert WER(HYP, REF_DIFF) > 0.0
    assert WER.compare_scores(0.1, 0.5) == 1  # lower is better


def test_ter():
    assert TER(HYP, REF_SAME) == 0.0
    score = TER(HYP, REF_DIFF)
    assert 0.0 < score <= 1.0
    # a pure block move should cost 1 shift, not N substitutions
    shifted = TER([["d", "a", "b", "c"]], [["a", "b", "c", "d"]])
    assert shifted == pytest.approx(0.25)


def test_ter_snover_worked_example():
    # Snover et al. (2006) §2: 1 shift ("this week") + 2 substitutions
    # + 1 insertion = 4 edits over a 13-word reference.
    hyp = ("this week the saudis denied information published "
           "in the new york times").split()
    ref = ("saudi arabia denied this week information published "
           "in the american new york times").split()
    assert TER([hyp], [ref]) == pytest.approx(4 / 13)


def test_ter_corpus_pooling():
    from neuralmonkey_tpu.evaluators.ter import corpus_ter, ter

    hyps = [["a", "b"], ["x"]]
    refs = [["a", "b"], ["x", "y", "z"]]
    # sentence TERs: 0/2 and 2/3; tercom pooling: (0 + 2) / (2 + 3)
    assert corpus_ter(hyps, refs) == pytest.approx(2 / 5)
    assert ter(hyps[1], refs[1]) == pytest.approx(2 / 3)


def test_chrf():
    assert ChrF3(HYP, REF_SAME) == pytest.approx(1.0)
    assert 0.0 < ChrF3(HYP, REF_DIFF) < 1.0


def test_gleu():
    assert GLEU(HYP, REF_SAME) == pytest.approx(1.0)
    assert 0.0 < GLEU(HYP, REF_DIFF) < 1.0


def test_accuracy():
    assert Accuracy([["a", "b"]], [["a", "c"]]) == pytest.approx(0.5)
    assert AccuracySeqLevel([["a", "b"]], [["a", "c"]]) == 0.0
    assert AccuracySeqLevel([["a"]], [["a"]]) == 1.0


def test_mse():
    assert MSE([[1.0, 2.0]], [[1.0, 2.0]]) == 0.0
    assert MSE([[1.0]], [[3.0]]) == pytest.approx(4.0)
    assert MSE.compare_scores(1.0, 2.0) == 1


def test_f1_bio():
    hyp = [["B-PER", "I-PER", "O", "B-LOC"]]
    ref = [["B-PER", "I-PER", "O", "B-LOC"]]
    assert F1(hyp, ref) == pytest.approx(1.0)
    hyp2 = [["B-PER", "O", "O", "B-LOC"]]
    assert 0.0 < F1(hyp2, ref) < 1.0


def test_edit_distance_eval():
    assert EditDistance(HYP, REF_SAME) == pytest.approx(1.0)
    assert 0.0 < EditDistance(HYP, REF_DIFF) < 1.0
