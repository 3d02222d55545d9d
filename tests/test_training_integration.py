"""Integration test: a tiny real experiment driven by an unchanged-
dialect INI (mirrors the reference's tests/*.ini strategy). Success =
runs to completion, loss decreases, outputs produced."""

import json
import os

import pytest

from neuralmonkey_tpu.dataset import load_dataset_from_files
from neuralmonkey_tpu.experiment import Experiment

CONFIG = os.path.join(os.path.dirname(__file__), "configs", "small.ini")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("small_exp"))
    exp = Experiment(
        CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=2",
                        "main.validation_period=20",
                        "encoder.dropout_keep_prob=1.0",
                        "decoder.dropout_keep_prob=1.0"])
    exp.train()
    return exp, out


def test_training_bounds_inflight_steps(tmp_path, monkeypatch):
    """The loop must wait (device-side) for step i-K before running
    ahead: an unbounded async backlog lets the per-device executors
    skew until XLA's collective-rendezvous check aborts the process
    (fatal SIGABRT on few-core hosts with warm compile caches —
    learning_utils._MAX_INFLIGHT_STEPS). Counts the block points and
    checks the bound engages roughly once per step past the window."""
    import jax

    from neuralmonkey_tpu import learning_utils

    blocked = []
    real_block = jax.block_until_ready

    def counting_block(tree):
        blocked.append(1)
        return real_block(tree)

    monkeypatch.setattr(jax, "block_until_ready", counting_block)
    monkeypatch.setattr(learning_utils, "_MAX_INFLIGHT_STEPS", 2)
    out = str(tmp_path / "bounded")
    exp = Experiment(
        CONFIG, train_mode=True,
        config_changes=[f'main.output="{out}"', "main.epochs=1",
                        "main.validation_period=500",
                        "main.logging_period=100"])
    exp.train()
    steps = exp.tf_manager.global_step
    assert steps > 3
    # every step past the first K blocks exactly once (other
    # block_until_ready users may add a handful more)
    assert len(blocked) >= steps - 2, (len(blocked), steps)


def test_training_runs_and_loss_decreases(trained):
    _, out = trained
    metrics_path = os.path.join(out, "metrics.jsonl")
    assert os.path.exists(metrics_path)
    records = [json.loads(line) for line in open(metrics_path)]
    train_losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert len(train_losses) >= 2
    assert train_losses[-1] < train_losses[0]


def test_checkpoints_and_best_link(trained):
    _, out = trained
    files = os.listdir(out)
    assert any(f.startswith("variables.data-") for f in files)
    assert "variables.data.best" in files
    assert "experiment.ini" in files
    assert "experiment.log" in files


def test_tensorboard_events_written(trained):
    from neuralmonkey_tpu.utils.tensorboard import read_events
    _, out = trained
    paths = [f for f in os.listdir(out)
             if f.startswith("events.out.tfevents.")]
    assert len(paths) == 1
    events = list(read_events(os.path.join(out, paths[0])))
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = {k for e in events for k in e["scalars"]}
    assert "train/loss" in scalars
    assert "val/target/BLEU-4" in scalars


def test_validation_metrics_present(trained):
    _, out = trained
    records = [json.loads(line)
               for line in open(os.path.join(out, "metrics.jsonl"))]
    val = [r for r in records if r["kind"] == "val"]
    assert val
    assert "target/BLEU-4" in val[-1]


def test_run_model_on_new_data(trained):
    exp, out = trained
    test_ds = load_dataset_from_files(
        name="test",
        s_source="tests/data/test.en",
        s_target="tests/data/test.de")
    results, outputs = exp.run_model(test_ds)
    assert len(outputs["target"]) == len(test_ds)
    assert all(isinstance(s, list) for s in outputs["target"])


def test_restore_and_rerun(trained):
    """A fresh Experiment restores the checkpoint and decodes
    identically (checkpoint roundtrip)."""
    exp, out = trained
    exp2 = Experiment(
        CONFIG, train_mode=False,
        config_changes=[f'main.output="{out}"'])
    exp2.build_model()
    exp2.restore_variables()
    test_ds = load_dataset_from_files(
        name="test", s_source="tests/data/test.en")
    _, outputs2 = exp2.run_model(test_ds)
    exp.restore_variables([os.path.join(out, "variables.data.best")])
    _, outputs1 = exp.run_model(test_ds)
    assert outputs1["target"] == outputs2["target"]


def test_provenance_copy_reflects_cli_overrides(trained):
    """The experiment-dir INI copy must record the EFFECTIVE config:
    opening it with a fresh Experiment (no overrides, as run/--cont
    do) resolves the overridden output dir and hyperparameters, not
    the original file's. The pristine original is kept alongside."""
    _, out = trained
    copy = os.path.join(out, "experiment.ini")
    assert os.path.exists(os.path.join(out, "experiment.orig.ini"))
    exp2 = Experiment(copy, train_mode=False)
    assert exp2.output_dir == out
    assert exp2.config.config_dict["main"]["epochs"] == 2
    assert exp2.config.config_dict["encoder"][
        "dropout_keep_prob"] == 1.0
    # and it is self-sufficient for inference: restores + decodes
    exp2.build_model()
    exp2.restore_variables()
    test_ds = load_dataset_from_files(
        name="test", s_source="tests/data/test.en")
    _, outputs = exp2.run_model(test_ds)
    assert len(outputs["target"]) == 30


def test_validation_score_fallback_directions():
    """Best-score fallback: direction-aware runtime_xent, None when no
    usable metric exists (regression: -inf used to be recorded as the
    first best, permanently blocking .best updates)."""
    from neuralmonkey_tpu.learning_utils import validation_score
    # main metric present: returned as-is
    assert validation_score({"t/BLEU": 3.0}, "t/BLEU", False) == 3.0
    # fallback: maximize convention negates xent
    assert validation_score({"runtime_xent": 2.0}, "t/BLEU",
                            False) == -2.0
    # fallback under minimize convention: raw xent (lower = better)
    assert validation_score({"runtime_xent": 2.0}, "t/BLEU",
                            True) == 2.0
    # nothing usable: None, never a sentinel
    assert validation_score({}, "t/BLEU", False) is None
    assert validation_score({}, None, True) is None
