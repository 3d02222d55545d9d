"""Transformer tests: encoder invariances, decoder train/decode parity
(KV-cache correctness), beam-search integration, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
    BeamSearchDecoder
from neuralmonkey_tpu.models.decoders.transformer import TransformerDecoder
from neuralmonkey_tpu.models.encoders.transformer import TransformerEncoder
from neuralmonkey_tpu.ops.attention import (causal_bias,
                                            sinusoidal_position_encoding)
from neuralmonkey_tpu.vocabulary import START_TOKEN_INDEX, Vocabulary

SRC = [["a", "b", "c"], ["b", "c"], ["a", "c", "b", "a"]]
TGT = [["x", "y"], ["y", "y", "x"], ["x", "z", "y"]]


@pytest.fixture(scope="module")
def model():
    vs, vt = Vocabulary(), Vocabulary()
    for s in SRC:
        vs.add_tokenized_text(s)
    for t in TGT:
        vt.add_tokenized_text(t)
    enc = TransformerEncoder(
        name="tenc", vocabulary=vs, data_id="source",
        embedding_size=16, depth=2, n_heads=4, ff_hidden_size=32,
        dropout_keep_prob=1.0)
    dec = TransformerDecoder(
        name="tdec", vocabulary=vt, data_id="target",
        max_output_len=6, encoders=[enc], embedding_size=16,
        depth=2, n_heads_self=4, n_heads_enc=4, ff_hidden_size=32,
        dropout_keep_prob=1.0)
    ds = Dataset("toy", {"source": SRC, "target": TGT})
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return enc, dec, params, batch


def test_position_encoding_shape():
    pe = sinusoidal_position_encoding(10, 16)
    assert pe.shape == (10, 16)
    # alternating sin/cos structure: first position is all sin(0)=0 /
    # cos(0)=1
    np.testing.assert_allclose(np.asarray(pe[0, :8]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[0, 8:]), 1.0, atol=1e-6)


def test_causal_bias():
    bias = np.asarray(causal_bias(4))
    assert bias.shape == (1, 1, 4, 4)
    assert bias[0, 0, 0, 1] < -1e8  # can't see the future
    assert bias[0, 0, 3, 0] == 0.0


def test_encoder_shapes_and_mask(model):
    enc, _, params, batch = model
    ctx = Context(params, batch, train=False)
    states = enc.temporal_states(ctx)
    assert states.shape == (3, 4, 16)
    # padding rows zeroed
    assert np.allclose(np.asarray(states)[0, 3], 0.0)
    assert enc.output(ctx).shape == (3, 16)


def test_encoder_padding_invariance(model):
    enc, _, params, _ = model
    vs = enc.input_sequence.vocabulary
    ids, mask = vs.sentences_to_tensor(SRC[:2])
    b1 = {"tenc_input.ids": jnp.asarray(ids),
          "tenc_input.mask": jnp.asarray(mask)}
    pad = np.zeros((2, 3), np.int32)
    b2 = {"tenc_input.ids": jnp.asarray(np.concatenate([ids, pad], 1)),
          "tenc_input.mask": jnp.asarray(
              np.concatenate([mask, pad.astype(np.float32)], 1))}
    s1 = enc.temporal_states(Context(params, b1))
    s2 = enc.temporal_states(Context(params, b2))
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(s2)[:, :ids.shape[1]],
                               atol=1e-5)


def test_train_logits_shape(model):
    _, dec, params, batch = model
    ctx = Context(params, batch, train=False)
    logits = dec.train_logits(ctx)
    assert logits.shape == (3, 4, len(dec.vocabulary))
    assert np.isfinite(float(dec.train_loss(ctx)))


def test_incremental_decode_matches_parallel(model):
    """decode_step with teacher tokens must reproduce train_logits —
    the KV-cache golden test."""
    _, dec, params, batch = model
    ctx = Context(params, batch, train=False)
    parallel_logits = np.asarray(dec.train_logits(ctx))

    constants = dec.decode_constants(ctx)
    state = dec.decode_initial_state(ctx, constants)
    inputs = np.asarray(batch["tdec.train_inputs"])  # (B, T)
    step_logits = []
    for t in range(inputs.shape[1]):
        state, logits, _ = dec.decode_step(
            constants, state, jnp.asarray(inputs[:, t]), t)
        step_logits.append(np.asarray(logits))
    incremental = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(incremental, parallel_logits,
                               atol=1e-4, rtol=1e-4)


def test_greedy_and_beam(model):
    _, dec, params, batch = model
    ctx = Context(params, batch, train=False)
    decoded = dec.decoded(ctx)
    assert decoded.shape == (3, 6)

    bs = BeamSearchDecoder(name="tbs", parent_decoder=dec, beam_size=1,
                           length_normalization=0.0)
    out = bs.search(Context(params, batch, train=False))
    np.testing.assert_array_equal(
        np.asarray(out.token_ids)[:, 0, :], np.asarray(decoded))


def test_label_smoothing_loss_larger(model):
    enc, dec, params, batch = model
    ctx = Context(params, batch, train=False)
    base = float(dec.train_loss(ctx))
    dec_ls = TransformerDecoder(
        name="tdec", vocabulary=dec.vocabulary, data_id="target",
        max_output_len=6, encoders=[enc], embedding_size=16,
        depth=2, n_heads_self=4, n_heads_enc=4, ff_hidden_size=32,
        dropout_keep_prob=1.0, label_smoothing=0.1)
    smoothed = float(dec_ls.train_loss(Context(params, batch)))
    assert smoothed > base  # smoothing adds uniform mass penalty


def test_transformer_overfits_toy(model):
    _, dec, params, batch = model

    @jax.jit
    def step(p):
        def loss_fn(p):
            return dec.train_loss(Context(p, batch, train=False))
        l, g = jax.value_and_grad(loss_fn)(p)
        return l, jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)

    p = params
    first = None
    for _ in range(60):
        l, p = step(p)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.5


def test_beam_lineage_matches_physical(model):
    """Lineage decoding (no physical cache reorder) must reproduce the
    gather-reordered beam search: identical hypotheses, equal scores
    up to reduction order."""
    _, dec, params, batch = model
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(
            name=f"lbs_{mode}", parent_decoder=dec, beam_size=4,
            length_normalization=0.6, lineage=mode)
        outs[mode] = bs.search(Context(params, batch, train=False))
    np.testing.assert_allclose(
        np.asarray(outs["on"].scores), np.asarray(outs["off"].scores),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(outs["on"].token_ids),
        np.asarray(outs["off"].token_ids))
    np.testing.assert_array_equal(
        np.asarray(outs["on"].lengths),
        np.asarray(outs["off"].lengths))


def test_fused_logit_selection_matches_unfused(model, monkeypatch):
    """Fused logit-projection selection (NM_FUSED_LOGITS=1) through
    the transformer's tied-embedding decode steps (both lineage and
    physical) must not change the search."""
    _, dec, params, batch = model
    for lineage in ("on", "off"):
        outs = {}
        for env in ("0", "1"):
            monkeypatch.setenv("NM_FUSED_LOGITS", env)
            bs = BeamSearchDecoder(
                name=f"fbs_{lineage}_{env}", parent_decoder=dec,
                beam_size=3, length_normalization=0.6,
                selection_method="hierarchical", lineage=lineage)
            outs[env] = jax.jit(
                lambda p, b, bs=bs:
                bs.search(Context(p, b, train=False)))(params, batch)
        np.testing.assert_array_equal(
            np.asarray(outs["0"].token_ids),
            np.asarray(outs["1"].token_ids))
        np.testing.assert_allclose(
            np.asarray(outs["0"].scores),
            np.asarray(outs["1"].scores), atol=1e-5)


def test_beam_lineage_ensemble_matches_physical(model):
    _, dec, params, batch = model
    params_b = init_all_params(
        collect_parts([dec]), jax.random.PRNGKey(7))
    ctxs = [Context(params, batch, train=False),
            Context(params_b, batch, train=False)]
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(
            name=f"ebs_{mode}", parent_decoder=dec, beam_size=3,
            length_normalization=0.6, lineage=mode)
        outs[mode] = bs.ensemble_search(ctxs)
    np.testing.assert_allclose(
        np.asarray(outs["on"].scores), np.asarray(outs["off"].scores),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(outs["on"].token_ids),
        np.asarray(outs["off"].token_ids))


def test_transformer_beam_attention_histories(model):
    """Transformer decode steps emit last-layer cross-attention; beam
    search records + resolves them identically on the lineage and
    physical paths (rows are distributions over the source)."""
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    _, dec, params, batch = model
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(name=f"tah_{mode}", parent_decoder=dec,
                               beam_size=3, length_normalization=0.6,
                               lineage=mode)
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(
                Context(p, b, train=False), with_attention=True)
        )(params, batch)
        outs[mode] = jax.tree_util.tree_map(np.asarray, out)
    src_len = next(v for k, v in batch.items()
                   if k.endswith(".ids")).shape[1]
    n_sent = outs["on"].token_ids.shape[0]
    for mode, out in outs.items():
        att = out.attention
        assert att.shape == (n_sent, 3, dec.max_output_len, src_len)
        for b in range(n_sent):
            n = int(out.lengths[b, 0])
            if n:
                np.testing.assert_allclose(
                    att[b, 0, :n].sum(-1), np.ones(n), atol=1e-4,
                    err_msg=mode)
    for b in range(n_sent):
        for k in range(3):
            n = int(outs["on"].lengths[b, k])
            np.testing.assert_allclose(
                outs["on"].attention[b, k, :n],
                outs["off"].attention[b, k, :n], atol=5e-4)


def test_remat_matches_default_loss_and_grads():
    """`remat=True` (jax.checkpoint per layer) must be numerically
    identical to the default path — same ops, same per-site rng — for
    the train loss AND its gradients, with every dropout site live."""
    vs, vt = Vocabulary(), Vocabulary()
    for s in SRC:
        vs.add_tokenized_text(s)
    for t in TGT:
        vt.add_tokenized_text(t)

    def build(remat):
        enc = TransformerEncoder(
            name="renc", vocabulary=vs, data_id="source",
            embedding_size=16, depth=2, n_heads=4, ff_hidden_size=32,
            dropout_keep_prob=0.9, attention_dropout_keep_prob=0.9,
            remat=remat)
        dec = TransformerDecoder(
            name="rdec", vocabulary=vt, data_id="target",
            max_output_len=6, encoders=[enc], embedding_size=16,
            depth=2, n_heads_self=4, n_heads_enc=4, ff_hidden_size=32,
            dropout_keep_prob=0.9, attention_dropout_keep_prob=0.9,
            remat=remat)
        return enc, dec

    ds = Dataset("toy", {"source": SRC, "target": TGT})
    results = {}
    for remat in (False, True):
        enc, dec = build(remat)
        parts = collect_parts([dec])
        params = init_all_params(parts, jax.random.PRNGKey(0))
        batch = {}
        for p in parts:
            batch.update(p.featurize(ds))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        @jax.jit
        def loss_fn(p, batch):
            ctx = Context(p, batch, train=True,
                          rng=jax.random.PRNGKey(7))
            return dec.train_loss(ctx)

        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        results[remat] = (float(loss),
                          jax.tree_util.tree_map(np.asarray, grads))

    assert results[False][0] == pytest.approx(results[True][0],
                                              rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        results[False][1], results[True][1])
