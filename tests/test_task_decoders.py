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


# ---------------------------------------------------------------------- #
# CTC prefix beam search
# ---------------------------------------------------------------------- #
class _FixedLogitsEnc:
    """Minimal TemporalStateful stand-in feeding fixed frames."""

    def __init__(self, mask):
        self._mask = jnp.asarray(mask)

    def temporal_mask(self, ctx):
        return self._mask


def _beam_on_logits(logits, mask, beam_width):
    dec = CTCDecoder.__new__(CTCDecoder)
    dec.beam_width = beam_width
    dec.encoder = _FixedLogitsEnc(mask)
    orig = CTCDecoder.logits
    try:
        CTCDecoder.logits = lambda self, ctx: jnp.asarray(logits)
        prefixes, scores = CTCDecoder.beam_search.__wrapped__(
            dec, object())
    finally:
        CTCDecoder.logits = orig
    return np.asarray(prefixes), np.asarray(scores)


def _ctc_logprob_np(lp, seq, blank=0):
    """Exact log P(seq | frames) via the CTC forward recursion."""
    ext = [blank]
    for s in seq:
        ext += [s, blank]
    n = len(ext)
    alpha = np.full(n, -np.inf)
    alpha[0] = lp[0][blank]
    if n > 1:
        alpha[1] = lp[0][ext[1]]
    for t in range(1, len(lp)):
        new = np.full(n, -np.inf)
        for s in range(n):
            acc = alpha[s]
            if s >= 1:
                acc = np.logaddexp(acc, alpha[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                acc = np.logaddexp(acc, alpha[s - 2])
            new[s] = acc + lp[t][ext[s]]
        alpha = new
    out = alpha[n - 1]
    if n > 1:
        out = np.logaddexp(out, alpha[n - 2])
    return out


def test_ctc_beam_matches_exact_marginals():
    """With the beam wide enough to hold every prefix, prefix beam
    search is the exact DP over label sequences: its best hypothesis
    and score must match brute-force enumeration."""
    import itertools
    rng = np.random.RandomState(3)
    for trial in range(4):
        time, vocab = rng.randint(3, 6), rng.randint(3, 5)
        logits = rng.randn(2, time, vocab).astype(np.float32) * 2
        mask = np.ones((2, time), np.float32)
        if trial % 2:
            mask[0, -1] = 0.0
        prefixes, scores = _beam_on_logits(logits, mask, 128)
        for b in range(2):
            t_valid = int(mask[b].sum())
            row = logits[b, :t_valid]
            lp = row - np.log(np.exp(row).sum(-1, keepdims=True))
            cands = []
            for length in range(0, t_valid + 1):
                for seq in itertools.product(range(1, vocab),
                                             repeat=length):
                    cands.append((_ctc_logprob_np(lp, seq), seq))
            cands.sort(key=lambda x: -x[0])
            got = tuple(int(x) for x in prefixes[b, 0] if x != 0)
            assert got == cands[0][1]
            assert scores[b, 0] == pytest.approx(cands[0][0],
                                                 abs=1e-3)


def test_ctc_beam_beats_greedy():
    """The canonical case where per-frame argmax is wrong: blank wins
    every frame, yet the summed paths of 'a' dominate the empty
    sequence. Greedy collapses to nothing; the beam must find 'a'."""
    p_blank, p_a = 0.6, 0.4
    frame = np.log(np.array([p_blank, p_a], np.float32))
    logits = np.tile(frame, (1, 2, 1))                 # (1, T=2, V=2)
    mask = np.ones((1, 2), np.float32)
    prefixes, scores = _beam_on_logits(logits, mask, 4)
    assert tuple(int(x) for x in prefixes[0, 0] if x != 0) == (1,)
    # P("a") = .4*.6 + .6*.4 + .4*.4 = .64 > P("") = .36
    assert scores[0, 0] == pytest.approx(np.log(0.64), abs=1e-5)
    # greedy on the same frames returns the empty sequence
    greedy_frames = logits.argmax(-1)
    assert (greedy_frames == 0).all()


def test_ctc_beam_through_decoder_path():
    """beam_width > 1 switches decoded() to the beam, end to end
    through a real encoder, under jit."""
    vt = _vocab([["x", "y", "z"]])
    feats = [RNG.randn(t, 5).astype(np.float32) for t in (9, 7, 11)]
    labels = [["x", "y"], ["z"], ["x", "z", "y"]]
    ds = Dataset("d", {"feats": feats, "labels": labels})
    enc = RawRNNEncoder(name="renc_b", data_id="feats", input_size=5,
                        rnn_size=8)
    ctc = CTCDecoder(name="ctc_b", encoder=enc, vocabulary=vt,
                     data_id="labels", beam_width=4)
    ctx, params = _run([ctc], ds)
    decoded = np.asarray(jax.jit(
        lambda p: ctc.decoded(Context(p, ctx.batch, train=False))
    )(params))
    assert decoded.shape[0] == 3
    assert (decoded >= 0).all() and (decoded < len(vt)).all()
    # beam-1-equivalent sanity: scores sorted best-first
    _, scores = jax.jit(
        lambda p: ctc.beam_search(Context(p, ctx.batch, train=False))
    )(params)
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-6).all()
