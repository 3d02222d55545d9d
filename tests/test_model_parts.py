"""Model-part tests: shapes, interfaces, param sharing, decoder paths
(mirrors reference test_encoders_init.py / test_decoder.py /
test_model_part.py intent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.model.sequence import (EmbeddedFactorSequence,
                                             EmbeddedSequence)
from neuralmonkey_tpu.models.attention.feed_forward import (
    Attention, CoverageAttention)
from neuralmonkey_tpu.models.attention.scaled_dot_product import \
    ScaledDotProdAttention
from neuralmonkey_tpu.models.decoders.decoder import Decoder
from neuralmonkey_tpu.models.encoders.recurrent import (FactoredEncoder,
                                                        SentenceEncoder)
from neuralmonkey_tpu.vocabulary import END_TOKEN_INDEX, Vocabulary

SRC = [["a", "b", "c"], ["b", "c"], ["a"]]
TGT = [["x", "y"], ["y", "y", "x"], ["x"]]


@pytest.fixture(scope="module")
def setup():
    vs = Vocabulary()
    vt = Vocabulary()
    for s in SRC:
        vs.add_tokenized_text(s)
    for t in TGT:
        vt.add_tokenized_text(t)
    ds = Dataset("toy", {"source": SRC, "target": TGT})
    return vs, vt, ds


def _build(parts, ds, train=False, rng=None):
    all_parts = collect_parts(parts)
    params = init_all_params(all_parts, jax.random.PRNGKey(0))
    batch = {}
    for p in all_parts:
        batch.update(p.featurize(ds, train=train))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return Context(params, batch, train=train, rng=rng), params


def test_embedded_sequence(setup):
    vs, _, ds = setup
    seq = EmbeddedSequence(name="seq", vocabulary=vs, data_id="source",
                           embedding_size=6)
    ctx, _ = _build([seq], ds)
    states = seq.temporal_states(ctx)
    mask = seq.temporal_mask(ctx)
    assert states.shape == (3, 3, 6)
    assert mask.shape == (3, 3)
    assert mask[1, 2] == 0.0  # padding masked


def test_factor_sequence(setup):
    vs, vt, ds2 = setup
    ds = Dataset("f", {"w": SRC, "t": SRC})
    seq = EmbeddedFactorSequence(
        name="fseq", vocabularies=[vs, vs], data_ids=["w", "t"],
        embedding_sizes=[4, 2])
    ctx, _ = _build([seq], ds)
    assert seq.temporal_states(ctx).shape == (3, 3, 6)
    assert seq.state_dim == 6


def test_sentence_encoder_shapes(setup):
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    ctx, _ = _build([enc], ds)
    assert enc.temporal_states(ctx).shape == (3, 3, 10)  # bidi 2*5
    assert enc.output(ctx).shape == (3, 10)
    assert enc.output_dim == 10


def test_unidirectional_encoder(setup):
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc_f", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5,
                          rnn_direction="forward", rnn_cell="LSTM")
    ctx, _ = _build([enc], ds)
    assert enc.temporal_states(ctx).shape == (3, 3, 5)
    assert enc.output_dim == 5


def test_encoder_padding_invariance(setup):
    """Extra padding must not change encoder outputs (static-shape
    bucketing correctness, SURVEY.md §8.3 item 2)."""
    vs, _, _ = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    parts = collect_parts([enc])
    params = init_all_params(parts, jax.random.PRNGKey(0))

    ids, mask = vs.sentences_to_tensor(SRC)
    batch1 = {"enc_input.ids": jnp.asarray(ids),
              "enc_input.mask": jnp.asarray(mask)}
    pad = np.zeros((3, 4), np.int32)
    batch2 = {
        "enc_input.ids": jnp.asarray(np.concatenate([ids, pad], 1)),
        "enc_input.mask": jnp.asarray(
            np.concatenate([mask, pad.astype(np.float32)], 1))}
    out1 = enc.output(Context(params, batch1))
    out2 = enc.output(Context(params, batch2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5)


def test_attention_weights_masked(setup):
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = Attention(name="att", encoder=enc)
    att.register_query_dim(7)
    ctx, params = _build([enc, att], ds)
    constants = att.precompute(ctx)
    query = jnp.ones((3, 7))
    context_vec, weights = att.step(params["att"], constants, query)
    assert context_vec.shape == (3, 10)
    assert weights.shape == (3, 3)
    w = np.asarray(weights)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert w[1, 2] == 0.0  # masked position gets zero weight
    assert w[2, 1] == 0.0


def test_scaled_dot_attention(setup):
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = ScaledDotProdAttention(name="sdp", keys_encoder=enc)
    att.register_query_dim(4)  # != key dim -> projection
    ctx, params = _build([enc, att], ds)
    constants = att.precompute(ctx)
    context_vec, weights = att.step(params["sdp"], constants,
                                    jnp.ones((3, 4)))
    assert context_vec.shape == (3, 10)
    np.testing.assert_allclose(
        np.asarray(weights).sum(axis=1), 1.0, atol=1e-5)


def test_multi_head_attention(setup):
    from neuralmonkey_tpu.models.attention.scaled_dot_product import \
        MultiHeadAttention
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = MultiHeadAttention(name="mha", n_heads=2, keys_encoder=enc)
    att.register_query_dim(4)
    ctx, params = _build([enc, att], ds)
    constants = att.precompute(ctx)
    query = jnp.ones((3, 4))
    context_vec, weights = att.step(params["mha"], constants, query)
    assert context_vec.shape == (3, 10)
    assert weights.shape == (3, 3)
    w = np.asarray(weights)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert w[1, 2] == 0.0  # masked position gets zero weight
    assert w[2, 1] == 0.0

    # step_beamed over shared constants == per-row step
    beamed_ctx, beamed_w = att.step_beamed(
        params["mha"], constants, query, beam=1)
    np.testing.assert_allclose(np.asarray(beamed_ctx),
                               np.asarray(context_vec), atol=1e-5)
    np.testing.assert_allclose(np.asarray(beamed_w), w, atol=1e-5)

    # attend_sequence (teacher forcing) == per-step loop
    queries = jnp.stack([query, 2.0 * query], axis=1)  # (B, 2, 4)
    seq_ctx, seq_w = att.attend_sequence(
        params["mha"], constants, queries)
    np.testing.assert_allclose(np.asarray(seq_ctx[:, 0]),
                               np.asarray(context_vec), atol=1e-5)
    step2_ctx, _ = att.step(params["mha"], constants, 2.0 * query)
    np.testing.assert_allclose(np.asarray(seq_ctx[:, 1]),
                               np.asarray(step2_ctx), atol=1e-5)


def test_scaled_dot_attention_weights_dropout(setup):
    """Reference parity (nm/attention/scaled_dot_product.py
    dropout_callback): with dropout_keep_prob < 1 and a train-scan
    rng, the softmax WEIGHTS are dropped before the value contraction
    — the context changes, the returned (undropped) weight history
    does not; no rng (inference) and keep=1 are identity."""
    from neuralmonkey_tpu.models.attention.scaled_dot_product import \
        MultiHeadAttention
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc_wd", vocabulary=vs,
                          data_id="source", embedding_size=6,
                          rnn_size=5)
    att = ScaledDotProdAttention(name="sdp_wd", keys_encoder=enc,
                                 dropout_keep_prob=0.5)
    att.register_query_dim(4)
    ctx, params = _build([enc, att], ds)
    constants = att.precompute(ctx)
    query = jnp.ones((3, 4))
    base_ctxv, base_w = att.step(params["sdp_wd"], constants, query)
    rng = jax.random.PRNGKey(7)
    drop_ctxv, drop_w = att.step(params["sdp_wd"], constants, query,
                                 dropout_rng=rng)
    assert not np.allclose(np.asarray(drop_ctxv),
                           np.asarray(base_ctxv))
    np.testing.assert_allclose(np.asarray(drop_w), np.asarray(base_w),
                               atol=1e-6)  # history stays undropped
    # keep=1.0 ignores the rng entirely
    att.dropout_keep_prob = 1.0
    same_ctxv, _ = att.step(params["sdp_wd"], constants, query,
                            dropout_rng=rng)
    np.testing.assert_allclose(np.asarray(same_ctxv),
                               np.asarray(base_ctxv), atol=1e-6)

    # the multi-head variant drops per-head weights the same way
    mh = MultiHeadAttention(name="mha_wd", n_heads=2,
                            keys_encoder=enc, dropout_keep_prob=0.5)
    mh.register_query_dim(4)
    ctx2, params2 = _build([enc, mh], ds)
    c2 = mh.precompute(ctx2)
    b_ctxv, _ = mh.step(params2["mha_wd"], c2, query)
    d_ctxv, _ = mh.step(params2["mha_wd"], c2, query, dropout_rng=rng)
    assert not np.allclose(np.asarray(d_ctxv), np.asarray(b_ctxv))


def test_bahdanau_attention_states_dropout(setup):
    """Reference parity (nm/attention/feed_forward.py
    attention_states_dropped): Bahdanau attention drops the attended
    STATES in train mode — train-ctx precompute with keep<1 differs
    from inference; inference is identity regardless of keep."""
    vs, _, ds = setup
    enc = SentenceEncoder(name="enc_sd", vocabulary=vs,
                          data_id="source", embedding_size=6,
                          rnn_size=5)
    att = Attention(name="att_sd", encoder=enc, dropout_keep_prob=0.5)
    att.register_query_dim(7)
    infer_ctx, params = _build([enc, att], ds)
    infer_states = np.asarray(att.precompute(infer_ctx).states)
    train_ctx, _ = _build([enc, att], ds, train=True,
                          rng=jax.random.PRNGKey(3))
    train_states = np.asarray(att.precompute(train_ctx).states)
    assert not np.allclose(train_states, infer_states)
    # dropped entries are exact zeros; survivors are scaled by 1/keep
    zeros = train_states == 0.0
    assert zeros.any()
    np.testing.assert_allclose(train_states[~zeros],
                               (infer_states * 2.0)[~zeros], rtol=1e-5)


def test_multi_head_attention_in_decoder(setup):
    """MultiHeadAttention drives a full RNN decoder: train loss is
    finite and greedy decode runs (the reference's Luong multi-head
    decoder-attention use case)."""
    from neuralmonkey_tpu.models.attention.scaled_dot_product import \
        MultiHeadAttention
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc_mh", vocabulary=vs,
                          data_id="source", embedding_size=6,
                          rnn_size=5)
    att = MultiHeadAttention(name="att_mh", n_heads=2,
                             keys_encoder=enc)
    dec = Decoder(name="dec_mh", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=6)
    ctx, params = _build([dec], ds, train=True,
                         rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(dec.train_loss(ctx)))
    ctx_eval = Context(params, ctx.batch, train=False)
    _, decoded, _ = dec.greedy_outputs(ctx_eval)
    assert decoded.shape == (3, 4)


def test_attention_dropout_threads_through_train_scan(setup):
    """The teacher-forced scan folds a fresh per-step rng into each
    attention's weights-dropout: with dropout_keep_prob < 1 the train
    loss differs from the keep=1 model under the SAME params and rng,
    is deterministic for a fixed rng, and greedy decode (inference,
    no rng) is identical for both settings."""
    from neuralmonkey_tpu.models.attention.scaled_dot_product import \
        MultiHeadAttention
    vs, vt, ds = setup

    def build_dec(keep):
        enc = SentenceEncoder(name="enc_ad", vocabulary=vs,
                              data_id="source", embedding_size=6,
                              rnn_size=5)
        att = MultiHeadAttention(name="att_ad", n_heads=2,
                                 keys_encoder=enc,
                                 dropout_keep_prob=keep)
        return Decoder(name="dec_ad", vocabulary=vt, data_id="target",
                       max_output_len=4, rnn_size=7, encoders=[enc],
                       attentions=[att], embedding_size=6)

    dec_plain = build_dec(1.0)
    ctx, params = _build([dec_plain], ds, train=True,
                         rng=jax.random.PRNGKey(5))
    loss_plain = float(dec_plain.train_loss(ctx))

    dec_drop = build_dec(0.5)  # same part names -> same params
    ctx_drop = Context(params, ctx.batch, train=True,
                       rng=jax.random.PRNGKey(5))
    loss_drop = float(dec_drop.train_loss(ctx_drop))
    assert np.isfinite(loss_drop)
    assert loss_drop != loss_plain

    # deterministic under a fixed rng
    ctx_again = Context(params, ctx.batch, train=True,
                        rng=jax.random.PRNGKey(5))
    assert float(dec_drop.train_loss(ctx_again)) == loss_drop

    # inference is identity regardless of the configured keep prob
    ctx_eval = Context(params, ctx.batch, train=False)
    _, ids_plain, _ = dec_plain.greedy_outputs(ctx_eval)
    ctx_eval2 = Context(params, ctx.batch, train=False)
    _, ids_drop, _ = dec_drop.greedy_outputs(ctx_eval2)
    np.testing.assert_array_equal(np.asarray(ids_plain),
                                  np.asarray(ids_drop))


def test_decoder_train_and_greedy(setup):
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = Attention(name="att", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=6)
    ctx, params = _build([dec], ds, train=True,
                         rng=jax.random.PRNGKey(1))
    logits = dec.train_logits(ctx)
    assert logits.shape == (3, 4, len(vt))  # T=max_target_len+1 capped
    loss = dec.train_loss(ctx)
    assert np.isfinite(float(loss))

    ctx_eval = Context(params, ctx.batch, train=False)
    _, decoded, aux = dec.greedy_outputs(ctx_eval)
    assert decoded.shape == (3, 4)
    assert aux["attention_weights"][0].shape[0] == 4  # (T, B, Tsrc)


def test_greedy_ids_matches_greedy_outputs(setup):
    """The lean early-exit greedy loop (while_loop, no logits stack —
    the serving path behind `decoded()`) must emit exactly the ids of
    the fixed-length scan path, including PAD after </s>."""
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc_g", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = Attention(name="att_g", encoder=enc)
    dec = Decoder(name="dec_g", vocabulary=vt, data_id="target",
                  max_output_len=12, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=6)
    ctx, params = _build([dec], ds)
    _, scan_ids, _ = dec.greedy_outputs(ctx)
    lean_ids = jax.jit(
        lambda p, b: dec.greedy_ids(Context(p, b, train=False))
    )(params, ctx.batch)
    np.testing.assert_array_equal(np.asarray(scan_ids),
                                  np.asarray(lean_ids))


def test_decoder_conditional_gru(setup):
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = Attention(name="att", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=6,
                  conditional_gru=True)
    ctx, _ = _build([dec], ds, train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(dec.train_loss(ctx)))


def test_decoder_coverage_attention(setup):
    vs, vt, ds = setup
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5)
    att = CoverageAttention(name="cov", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=6)
    ctx, _ = _build([dec], ds, train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(dec.train_loss(ctx)))


def test_param_sharing_via_reuse(setup):
    vs, _, ds = setup
    enc1 = SentenceEncoder(name="e1", vocabulary=vs, data_id="source",
                           embedding_size=6, rnn_size=5)
    enc2 = SentenceEncoder(name="e2", vocabulary=vs, data_id="source",
                           embedding_size=6, rnn_size=5, reuse=enc1)
    parts = collect_parts([enc1, enc2])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    assert "e1" in params
    assert "e2" not in params  # shares e1's params
    assert enc2.param_key == "e1"


def test_embeddings_shared_with_decoder(setup):
    vs, vt, ds = setup
    seq = EmbeddedSequence(name="tgt_emb", vocabulary=vt,
                           data_id="target", embedding_size=6)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, embeddings_source=seq,
                  tie_embeddings=True, output_projection="mlp")
    parts = collect_parts([dec])
    names = {p.name for p in parts}
    assert "tgt_emb" in names
    assert "dec_embeddings" not in names
    params = init_all_params(parts, jax.random.PRNGKey(0))
    assert "logit" not in params["dec"]  # tied => no separate logit W


def test_duplicate_part_names_rejected(setup):
    """Two DIFFERENT parts with one name would silently share (the
    first one's structure wins) — must raise instead; intentional
    sharing goes through reuse=."""
    vs, _, _ = setup
    e1 = EmbeddedSequence(name="emb", vocabulary=vs,
                          data_id="source", embedding_size=6)
    e2 = EmbeddedSequence(name="emb", vocabulary=vs,
                          data_id="source", embedding_size=8)
    with pytest.raises(ValueError, match="named 'emb'"):
        init_all_params(collect_parts([e1, e2]), jax.random.PRNGKey(0))
