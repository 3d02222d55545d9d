"""Task decoders (classifier, labeler, regressor, CTC, LM, alignment)
+ their runners — mirrors the reference's per-capability INI coverage
at the unit level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.models.attention.feed_forward import Attention
from neuralmonkey_tpu.models.decoders.classifier import Classifier
from neuralmonkey_tpu.models.decoders.ctc_decoder import CTCDecoder
from neuralmonkey_tpu.models.decoders.decoder import Decoder
from neuralmonkey_tpu.models.decoders.sequence_labeler import \
    SequenceLabeler
from neuralmonkey_tpu.models.decoders.sequence_regressor import \
    SequenceRegressor
from neuralmonkey_tpu.models.decoders.word_alignment_decoder import \
    WordAlignmentDecoder
from neuralmonkey_tpu.models.encoders.raw_rnn_encoder import RawRNNEncoder
from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
from neuralmonkey_tpu.models.encoders.sentence_cnn_encoder import (
    SentenceCNNEncoder, SequenceCNNEncoder)
from neuralmonkey_tpu.runners.ctc_debug_runner import CTCDebugRunner
from neuralmonkey_tpu.runners.label_runner import LabelRunner
from neuralmonkey_tpu.runners.logits_runner import LogitsRunner
from neuralmonkey_tpu.runners.perplexity_runner import PerplexityRunner
from neuralmonkey_tpu.runners.plain_runner import PlainRunner
from neuralmonkey_tpu.runners.regression_runner import RegressionRunner
from neuralmonkey_tpu.runners.representation_runner import \
    RepresentationRunner
from neuralmonkey_tpu.runners.tensor_runner import TensorRunner
from neuralmonkey_tpu.runners.word_alignment_runner import \
    WordAlignmentRunner
from neuralmonkey_tpu.vocabulary import Vocabulary

RNG = np.random.RandomState(0)
SRC = [["a", "b", "c"], ["b", "c"], ["c", "a", "b", "a"]]


def _vocab(tokens):
    v = Vocabulary()
    for t in tokens:
        v.add_tokenized_text(t)
    return v


def _run(parts, ds, train=True):
    all_parts = collect_parts(parts)
    params = init_all_params(all_parts, jax.random.PRNGKey(0))
    batch = {}
    for p in all_parts:
        batch.update(p.featurize(ds, train=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return Context(params, batch, train=train,
                   rng=jax.random.PRNGKey(1)), params


def _fetch(runner, ctx, n):
    fetched = jax.tree_util.tree_map(np.asarray, runner.fetches(ctx))
    return runner.collect_results(fetched, n)


def test_classifier_and_plain_runner():
    vs = _vocab(SRC)
    vl = _vocab([["pos"], ["neg"]])
    ds = Dataset("d", {"source": SRC,
                       "label": [["pos"], ["neg"], ["pos"]]})
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    clf = Classifier(name="clf", encoders=[enc], vocabulary=vl,
                     data_id="label", layers=[16],
                     dropout_keep_prob=1.0)
    ctx, _ = _run([clf], ds)
    assert np.isfinite(float(clf.train_loss(ctx)))
    result = _fetch(PlainRunner("label", clf), ctx, 3)
    assert len(result.outputs) == 3
    assert result.outputs[0][0] in ("pos", "neg", "<pad>", "<s>",
                                    "</s>", "<unk>")
    assert "loss" in result.losses


def test_sequence_labeler_and_label_runner():
    vs = _vocab(SRC)
    vt = _vocab([["B", "I", "O"]])
    tags = [["B", "I", "O"], ["B", "O"], ["O", "O", "B", "I"]]
    ds = Dataset("d", {"source": SRC, "tags": tags})
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    labeler = SequenceLabeler(name="lab", encoder=enc, vocabulary=vt,
                              data_id="tags", hidden_dim=12)
    ctx, _ = _run([labeler], ds)
    assert np.isfinite(float(labeler.train_loss(ctx)))
    result = _fetch(LabelRunner("tags", labeler), ctx, 3)
    # output lengths match input sentence lengths
    assert [len(s) for s in result.outputs] == [3, 2, 4]


def test_sequence_regressor_and_runner():
    vs = _vocab(SRC)
    ds = Dataset("d", {"source": SRC,
                       "score": [[0.5], [1.5], [-0.25]]})
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    reg = SequenceRegressor(name="reg", encoders=[enc],
                            data_id="score", layers=[8])
    ctx, _ = _run([reg], ds)
    assert np.isfinite(float(reg.train_loss(ctx)))
    result = _fetch(RegressionRunner("score", reg), ctx, 3)
    assert len(result.outputs) == 3
    assert isinstance(result.outputs[0], float)
    assert "mse" in result.losses


def test_ctc_decoder_and_debug_runner():
    vt = _vocab([["x", "y", "z"]])
    feats = [RNG.randn(t, 5).astype(np.float32) for t in (9, 7, 11)]
    labels = [["x", "y"], ["z"], ["x", "z", "y"]]
    ds = Dataset("d", {"feats": feats, "labels": labels})
    enc = RawRNNEncoder(name="renc", data_id="feats", input_size=5,
                        rnn_size=8)
    ctc = CTCDecoder(name="ctc", encoder=enc, vocabulary=vt,
                     data_id="labels")
    ctx, params = _run([ctc], ds)
    loss = float(ctc.train_loss(ctx))
    assert np.isfinite(loss) and loss > 0
    decoded = np.asarray(ctc.decoded(ctx))
    assert decoded.shape[0] == 3
    # in-graph collapse must match the reference python collapse of the
    # argmax frames (merge repeats, drop blanks)
    logits = np.asarray(ctc.logits(ctx))
    mask = np.asarray(enc.temporal_mask(ctx))
    for b, row in enumerate(decoded):
        frames = logits[b].argmax(-1)
        frames[mask[b] == 0] = 0
        expected, prev = [], 0
        for f in frames:
            if f != 0 and f != prev:
                expected.append(int(f))
            prev = int(f)
        got = [int(x) for x in row if x != 0]
        assert got == expected
    result = _fetch(CTCDebugRunner("debug", ctc), ctx, 3)
    assert [len(s) for s in result.outputs] == [9, 7, 11]


def test_ctc_loss_decreases():
    vt = _vocab([["x", "y"]])
    feats = [RNG.randn(8, 4).astype(np.float32) for _ in range(4)]
    labels = [["x", "y"], ["y"], ["x"], ["y", "x"]]
    ds = Dataset("d", {"feats": feats, "labels": labels})
    enc = RawRNNEncoder(name="renc", data_id="feats", input_size=4,
                        rnn_size=6)
    ctc = CTCDecoder(name="ctc", encoder=enc, vocabulary=vt,
                     data_id="labels")
    ctx, params = _run([ctc], ds)
    batch = ctx.batch

    @jax.jit
    def step(p):
        loss_fn = lambda p: ctc.train_loss(Context(p, batch))
        l, g = jax.value_and_grad(loss_fn)(p)
        return l, jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)

    p = params
    first = None
    for _ in range(30):
        l, p = step(p)
        first = first if first is not None else float(l)
    assert float(l) < first


def test_language_model_and_perplexity():
    """Decoder with no encoders/attentions = LM; perplexity runner."""
    vt = _vocab(SRC)
    ds = Dataset("d", {"source": SRC})
    lm = Decoder(name="lm", vocabulary=vt, data_id="source",
                 max_output_len=6, rnn_size=10, embedding_size=8)
    ctx, _ = _run([lm], ds)
    assert np.isfinite(float(lm.train_loss(ctx)))
    result = _fetch(PerplexityRunner("perp", lm), ctx, 3)
    assert len(result.outputs) == 3
    assert all(p > 0 for p in result.outputs)


def test_word_alignment_decoder_and_runner():
    vs = _vocab(SRC)
    vt = _vocab(SRC)
    alignments = [["0-0", "1-1"], ["0-0"], ["1-0", "2-1"]]
    ds = Dataset("d", {"source": SRC, "target": SRC,
                       "align": alignments})
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6,
                          max_input_len=6)
    att = Attention(name="att", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=5, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    wad = WordAlignmentDecoder(name="wad", encoder=enc, decoder=dec,
                               data_id="align")
    ctx, _ = _run([dec, wad], ds)
    loss = float(wad.train_loss(ctx))
    assert np.isfinite(loss) and loss > 0
    result = _fetch(WordAlignmentRunner("align", decoder=wad), ctx, 3)
    assert result.outputs[0].ndim == 2


def test_cnn_text_encoders():
    vs = _vocab(SRC)
    ds = Dataset("d", {"source": SRC})
    enc = SentenceCNNEncoder(name="scnn", vocabulary=vs,
                             data_id="source", embedding_size=8,
                             filters=[(3, 10), (5, 12)], rnn_size=6)
    ctx, _ = _run([enc], ds, train=False)
    assert enc.temporal_states(ctx).shape == (3, 4, 12)
    assert enc.output(ctx).shape == (3, 12)

    enc2 = SequenceCNNEncoder(name="qcnn", vocabulary=vs,
                              data_id="source", embedding_size=8,
                              filters=[(2, 5), (3, 7)])
    ctx2, _ = _run([enc2], ds, train=False)
    assert enc2.output(ctx2).shape == (3, 12)
    assert enc2.output_dim == 12


def test_representation_logits_tensor_runners():
    vs = _vocab(SRC)
    vl = _vocab([["pos"], ["neg"]])
    ds = Dataset("d", {"source": SRC,
                       "label": [["pos"], ["neg"], ["pos"]]})
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    clf = Classifier(name="clf", encoders=[enc], vocabulary=vl,
                     data_id="label", dropout_keep_prob=1.0)
    ctx, _ = _run([clf], ds)

    rep = _fetch(RepresentationRunner("rep", enc), ctx, 3)
    assert rep.outputs[0].shape == (12,)

    logits = _fetch(LogitsRunner("lg", clf, normalize=True), ctx, 3)
    assert len(logits.outputs) == 3
    values = [float(x) for x in logits.outputs[0].split(",")]
    assert abs(sum(values) - 1.0) < 1e-3  # softmaxed

    tensor_runner = TensorRunner(
        "t", modelparts=[enc, clf],
        tensors=["enc.output", "clf.logits"])
    result = _fetch(tensor_runner, ctx, 2)
    assert set(result.outputs[0].keys()) == {"enc.output", "clf.logits"}
