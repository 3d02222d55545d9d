"""Quality gates: captioning (milestone 4) + hierarchical multimodal
MT (milestone 5), from unchanged-dialect INIs (VERDICT r2 item 2).

Both corpora come from tests/data/gen_multimodal.py and encode the
target text in the image features, so the gates can demand real BLEU:

- captioning: the caption is written into the feature map slots — a
  correct model reads it back out (BLEU near 100); the gate sits far
  above anything a feature-blind decoder can reach (language-model
  prior over 10 uniform shape words).
- multimodal MT: the final target word is a shape encoded ONLY in the
  image. The image-blind control (same config, zeroed features) can
  translate the digit words but must guess the shape 1-in-4, so the
  full model must beat it by a wide BLEU margin — asserting the
  hierarchical attention actually uses the second modality.
"""

import json
import os

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


def test_captioning_quality_gate(tmp_path):
    _, records = _train("captioning.ini", str(tmp_path / "cap"),
                        ["main.epochs=12", "main.logging_period=50",
                         "main.validation_period=200",
                         "decoder.dropout_keep_prob=1.0"])
    losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert losses[-1] < losses[0]
    val = [r for r in records if r["kind"] == "val"]
    # the caption is deterministically decodable from the features:
    # the gate demands the model actually reads them (a feature-blind
    # decoder tops out far below — 10 uniform shapes)
    assert val[-1]["caption/BLEU-4"] > 60.0, val[-1]


def test_multimodal_hierarchical_uses_the_image(tmp_path):
    """Full model vs image-blind control: the shape word in the
    target is decidable only from the image, so the margin proves the
    hierarchical attention routes information from the second
    modality (not just that a text model converged)."""
    data = os.path.join(os.path.dirname(__file__), "data")
    base_changes = ["main.epochs=10", "main.logging_period=50",
                    "main.validation_period=400",
                    "decoder.dropout_keep_prob=1.0",
                    "text_encoder.dropout_keep_prob=1.0"]

    _, records = _train("hier_multimodal.ini",
                        str(tmp_path / "full"), base_changes)
    losses = [r["loss"] for r in records if r["kind"] == "train"]
    assert losses[-1] < losses[0]
    full = [r for r in records
            if r["kind"] == "val"][-1]["target/BLEU-4"]

    zero_train = os.path.join(data, "mmt_feats_zero_train.npy")
    zero_val = os.path.join(data, "mmt_feats_zero_val.npy")
    _, records = _train(
        "hier_multimodal.ini", str(tmp_path / "blind"),
        base_changes + [
            "train_data.s_feats=("
            f'"{zero_train}", readers.numpy_reader.single_tensor)',
            "val_data.s_feats=("
            f'"{zero_val}", readers.numpy_reader.single_tensor)'])
    blind = [r for r in records
             if r["kind"] == "val"][-1]["target/BLEU-4"]

    # digits translate either way; the shape word separates them
    assert full > 60.0, (full, blind)
    assert full - blind > 10.0, (full, blind)
