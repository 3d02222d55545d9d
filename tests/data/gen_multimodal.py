"""Deterministic corpora for the captioning + multimodal quality gates
(VERDICT r2 item 2): unlike random features, these encode the target
text IN the image features, so the tasks are provably learnable and
the gates can demand real BLEU — a correct-but-garbage decoder fails.

Captioning (milestone 4): the caption's words are written into the
(4, 4, 8) feature map — word i of the caption occupies flattened
spatial position i with channels [word-index bits 0-3 (±1),
active=+1, position bits 0-1 (±1), 0]. A model only has to learn to
attend slot i at step i and decode the 4-bit word code; BLEU ≈ 100 is
reachable, so the gate can sit far above chance.

Multimodal MT (milestone 5): the source is a digit-word sentence plus
the (always identical) token "object"; the target appends the German
shape word for a shape encoded ONLY in the image (uniform one-hot
over the first 4 channels at every position). A text-only model can
translate the digits but must guess the shape (1-in-4), so its BLEU
is provably lower — that margin is what the hierarchical attention
gate asserts (the image-blind control trains on zeroed features).

Run from the repo root: ``python tests/data/gen_multimodal.py``.
"""

import os
import random

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

SHAPES = ("circle cross star triangle square moon heart spiral "
          "diamond ring").split()
DIGITS_EN = "zero one two three four five six seven eight nine".split()
DIGITS_DE = ("null eins zwei drei vier fuenf sechs sieben acht "
             "neun").split()
MMT_SHAPES_DE = ["kreis", "stern", "dreieck", "quadrat"]


def _bits(value: int, n: int):
    return [1.0 if value & (1 << b) else -1.0 for b in range(n)]


def caption_features(words) -> np.ndarray:
    """(4, 4, 8) map encoding up to 4 caption words at flattened
    spatial positions 0..3."""
    feats = np.zeros((16, 8), np.float32)
    for pos, word in enumerate(words):
        idx = SHAPES.index(word)
        feats[pos, 0:4] = _bits(idx, 4)
        feats[pos, 4] = 1.0
        feats[pos, 5:7] = _bits(pos, 2)
    return feats.reshape(4, 4, 8)


def gen_captioning(n_train: int = 200, n_val: int = 40,
                   seed: int = 11):
    rng = random.Random(seed)

    def sample(n, feats_path, text_path):
        feats = []
        with open(os.path.join(HERE, text_path), "w") as f:
            for _ in range(n):
                words = [rng.choice(SHAPES)
                         for _ in range(rng.randint(1, 4))]
                f.write(" ".join(words) + "\n")
                feats.append(caption_features(words))
        np.save(os.path.join(HERE, feats_path), np.stack(feats))

    sample(n_train, "caption_feats.npy", "captions_train.txt")
    sample(n_val, "caption_feats_val.npy", "captions_val.txt")


def mmt_features(shape_idx: int) -> np.ndarray:
    feats = np.zeros((4, 4, 8), np.float32)
    feats[:, :, shape_idx] = 1.0
    return feats


def gen_multimodal(n_train: int = 300, n_val: int = 60,
                   seed: int = 13):
    rng = random.Random(seed)

    def sample(n, src_path, tgt_path, feats_path, zero_path):
        feats = []
        src = open(os.path.join(HERE, src_path), "w")
        tgt = open(os.path.join(HERE, tgt_path), "w")
        with src, tgt:
            for _ in range(n):
                ids = [rng.randrange(10)
                       for _ in range(rng.randint(2, 6))]
                shape = rng.randrange(len(MMT_SHAPES_DE))
                src.write(" ".join(
                    [DIGITS_EN[i] for i in ids] + ["object"]) + "\n")
                tgt.write(" ".join(
                    [DIGITS_DE[i] for i in ids]
                    + [MMT_SHAPES_DE[shape]]) + "\n")
                feats.append(mmt_features(shape))
        stacked = np.stack(feats)
        np.save(os.path.join(HERE, feats_path), stacked)
        # the image-blind control: same sentences, zeroed features
        np.save(os.path.join(HERE, zero_path),
                np.zeros_like(stacked))

    sample(n_train, "mmt_src_train.txt", "mmt_tgt_train.txt",
           "mmt_feats_train.npy", "mmt_feats_zero_train.npy")
    sample(n_val, "mmt_src_val.txt", "mmt_tgt_val.txt",
           "mmt_feats_val.npy", "mmt_feats_zero_val.npy")


if __name__ == "__main__":
    gen_captioning()
    gen_multimodal()
    print("captioning + multimodal corpora regenerated")
