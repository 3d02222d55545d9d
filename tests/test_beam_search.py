"""Beam-search tests: greedy equivalence at beam=1, score ordering,
length penalty, ensembling, runner integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                         init_all_params)
from neuralmonkey_tpu.models.attention.feed_forward import Attention
from neuralmonkey_tpu.models.decoders.beam_search_decoder import (
    BeamSearchDecoder, length_penalty)
from neuralmonkey_tpu.models.decoders.decoder import Decoder
from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
from neuralmonkey_tpu.runners.beam_search_runner import BeamSearchRunner
from neuralmonkey_tpu.vocabulary import Vocabulary

SRC = [["a", "b", "c"], ["b", "c"], ["a", "c", "c", "b"]]
TGT = [["x", "y"], ["y", "y", "x"], ["x", "z"]]


@pytest.fixture(scope="module")
def model():
    vs, vt = Vocabulary(), Vocabulary()
    for s in SRC:
        vs.add_tokenized_text(s)
    for t in TGT:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    att = Attention(name="att", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=6, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    ds = Dataset("toy", {"source": SRC, "target": TGT})
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return dec, params, batch


def test_length_penalty():
    lengths = jnp.asarray([[5]], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(length_penalty(lengths, 0.0)), 1.0)
    lp = float(length_penalty(lengths, 1.0)[0, 0])
    assert lp == pytest.approx(10.0 / 6.0)


def test_beam1_matches_greedy(model):
    """Beam=1 with no length norm must reproduce the greedy path."""
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=1,
                           length_normalization=0.0)
    ctx = Context(params, batch, train=False)
    out = bs.search(ctx)
    greedy = np.asarray(dec.decoded(Context(params, batch, train=False)))
    beam_ids = np.asarray(out.token_ids)[:, 0, :]
    np.testing.assert_array_equal(beam_ids, greedy)


def test_beams_sorted_and_scores_finite(model):
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=4,
                           length_normalization=0.6)
    out = bs.search(Context(params, batch, train=False))
    scores = np.asarray(out.scores)
    assert scores.shape == (3, 4)
    assert np.all(np.diff(scores, axis=1) <= 1e-5)  # best-first
    assert np.all(np.isfinite(scores[:, 0]))
    # top beam should be at least as good as greedy's sequence prob
    assert out.token_ids.shape == (3, 4, 6)


def test_beam_search_jits(model):
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=3)

    @jax.jit
    def run(p, b):
        return bs.search(Context(p, b, train=False)).token_ids

    ids = run(params, batch)
    assert ids.shape == (3, 3, 6)


def test_ensemble_search(model):
    """Averaging two identical models must equal the single model."""
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=3,
                           length_normalization=0.6)
    single = bs.search(Context(params, batch, train=False))
    double = bs.ensemble_search([
        Context(params, batch, train=False),
        Context(params, batch, train=False)])
    np.testing.assert_array_equal(np.asarray(single.token_ids),
                                  np.asarray(double.token_ids))
    np.testing.assert_allclose(np.asarray(single.scores),
                               np.asarray(double.scores), atol=1e-4)

    # a genuinely different second model should (generally) change
    # something — at minimum it must run and produce valid output
    params2 = init_all_params(collect_parts([dec]),
                              jax.random.PRNGKey(42))
    mixed = bs.ensemble_search([
        Context(params, batch, train=False),
        Context(params2, batch, train=False)])
    assert np.asarray(mixed.token_ids).shape == (3, 3, 6)


def test_beam_search_runner(model):
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=3)
    runner = BeamSearchRunner(output_series="target", decoder=bs)
    fetched = jax.tree_util.tree_map(
        np.asarray,
        runner.fetches(Context(params, batch, train=False)))
    result = runner.collect_results(fetched, 3)
    assert len(result.outputs) == 3
    assert all(isinstance(s, list) for s in result.outputs)
    assert "beam_score" in result.losses


def test_runner_rank_validation(model):
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec, beam_size=3)
    with pytest.raises(ValueError):
        BeamSearchRunner(output_series="t", decoder=bs, rank=4)


def test_hierarchical_selector_matches_flat():
    """The exact two-stage (row-max) selector must agree with the flat
    (B, K·V) top-k on live-beam states — same parents, tokens, scores.
    (In the dead-beam garbage region at NEG_INF, f32 ties may break
    differently; that never affects surfaced hypotheses.)"""
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import (
        SearchState)
    for trial in range(20):
        rng = np.random.RandomState(trial)
        batch = rng.randint(1, 5)
        beam = rng.randint(2, 8)
        vocab = int(rng.choice([64, 100, 128, 300, 1000, 3001]))
        bs = BeamSearchDecoder.__new__(BeamSearchDecoder)
        bs.beam_size = beam
        bs.length_normalization = float(rng.choice([0.0, 0.6, 1.0]))
        bs.use_approx_top_k = False
        x = jnp.asarray(rng.randn(batch * beam, vocab)
                        .astype(np.float32) * 3)
        search = SearchState(
            logprob_sum=jnp.asarray(
                (-rng.rand(batch, beam) * 10).astype(np.float32)),
            lengths=jnp.asarray(
                rng.randint(0, 9, (batch, beam)).astype(np.int32)),
            finished=jnp.asarray(rng.rand(batch, beam) < 0.3),
            token_ids=jnp.zeros((batch, beam, 10), jnp.int32))
        for normalized in (False, True):
            xx = jax.nn.log_softmax(x, -1) if normalized else x
            flat = bs._select_flat(xx, normalized, search, batch)
            hier = bs._select_hier(xx, normalized, search, batch)
            np.testing.assert_array_equal(
                np.asarray(flat[0]), np.asarray(hier[0]))  # parents
            np.testing.assert_array_equal(
                np.asarray(flat[1]), np.asarray(hier[1]))  # tokens
            np.testing.assert_allclose(
                np.asarray(flat[2]), np.asarray(hier[2]), atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(flat[3]), np.asarray(hier[3]), atol=1e-5)


def test_hierarchical_full_search_matches_flat(model):
    """Whole-search equivalence through the jitted while_loop."""
    dec, params, batch = model
    outs = {}
    for method in ("flat", "hierarchical"):
        bs = BeamSearchDecoder(
            name="bs_sel_" + method, parent_decoder=dec, beam_size=3,
            length_normalization=0.6, selection_method=method,
            align_logits=True)
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(Context(p, b, train=False))
        )(params, batch)
        outs[method] = jax.tree_util.tree_map(np.asarray, out)
    np.testing.assert_array_equal(outs["flat"].token_ids,
                                  outs["hierarchical"].token_ids)
    np.testing.assert_allclose(outs["flat"].scores,
                               outs["hierarchical"].scores, atol=1e-5)


def test_max_steps_clamped_to_parent(model):
    """KV caches are sized by the parent's max_output_len; a larger
    max_steps must be clamped, not silently overrun the caches."""
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs_clamp", parent_decoder=dec,
                           beam_size=2, max_steps=100)
    assert bs.max_steps == dec.max_output_len


def test_hierarchical_with_tied_embeddings(model):
    """Lane-aligned logits via the tied-embedding path (embed table +
    logit_bias padded) must match the flat selector."""
    dec, params, batch = model
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.model.part import (collect_parts,
                                             init_all_params)
    tied = Decoder(name="dec_tied", vocabulary=dec.vocabulary,
                   data_id="target", max_output_len=6, rnn_size=7,
                   encoders=dec.encoders, attentions=dec.attentions,
                   embedding_size=8, tie_embeddings=True,
                   output_projection="mlp")
    parts = collect_parts([tied])
    tied_params = init_all_params(parts, jax.random.PRNGKey(0))
    tied_params.update({k: v for k, v in params.items()
                        if k in tied_params and k.startswith("enc")})
    outs = {}
    for method in ("flat", "hierarchical"):
        bs = BeamSearchDecoder(
            name="bst_" + method, parent_decoder=tied, beam_size=3,
            selection_method=method, align_logits=True)
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(Context(p, b, train=False))
        )(tied_params, batch)
        outs[method] = jax.tree_util.tree_map(np.asarray, out)
    np.testing.assert_array_equal(outs["flat"].token_ids,
                                  outs["hierarchical"].token_ids)
    np.testing.assert_allclose(outs["flat"].scores,
                               outs["hierarchical"].scores, atol=1e-5)


def test_fused_logit_selection_matches_unfused(model, monkeypatch):
    """NM_FUSED_LOGITS=1 arms decode constants so decode steps emit
    the hierarchical selector's reductions from the fused logit
    projection (ops/beam_select.fused_logits_rowmax_lse; pure-JAX
    reference on CPU). The full jitted search must be unchanged."""
    dec, params, batch = model

    def run(env):
        monkeypatch.setenv("NM_FUSED_LOGITS", env)
        bs = BeamSearchDecoder(
            name=f"bsf_{env}", parent_decoder=dec, beam_size=3,
            length_normalization=0.6,
            selection_method="hierarchical")
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(Context(p, b, train=False))
        )(params, batch)
        return jax.tree_util.tree_map(np.asarray, out)

    off, on = run("0"), run("1")
    np.testing.assert_array_equal(off.token_ids, on.token_ids)
    np.testing.assert_allclose(off.scores, on.scores, atol=1e-5)


def test_fused_logit_selection_tied_embeddings(model, monkeypatch):
    """Fusion through the tied-embedding layout (w = embed_table.T)
    and under lineage decoding."""
    dec, params, batch = model
    tied = Decoder(name="dec_tied_f", vocabulary=dec.vocabulary,
                   data_id="target", max_output_len=6, rnn_size=7,
                   encoders=dec.encoders, attentions=dec.attentions,
                   embedding_size=8, tie_embeddings=True,
                   output_projection="mlp")
    parts = collect_parts([tied])
    tied_params = init_all_params(parts, jax.random.PRNGKey(0))
    tied_params.update({k: v for k, v in params.items()
                        if k in tied_params and k.startswith("enc")})

    def run(env):
        monkeypatch.setenv("NM_FUSED_LOGITS", env)
        bs = BeamSearchDecoder(
            name=f"bstf_{env}", parent_decoder=tied, beam_size=3,
            length_normalization=0.6,
            selection_method="hierarchical", lineage="on")
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(Context(p, b, train=False))
        )(tied_params, batch)
        return jax.tree_util.tree_map(np.asarray, out)

    off, on = run("0"), run("1")
    np.testing.assert_array_equal(off.token_ids, on.token_ids)
    np.testing.assert_allclose(off.scores, on.scores, atol=1e-5)


def test_rnn_lineage_matches_physical(model):
    """RNN lineage decoding (shared attention constants, in-step state
    gather) must reproduce the physically-reordered search."""
    dec, params, batch = model
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(
            name=f"rlin_{mode}", parent_decoder=dec, beam_size=4,
            length_normalization=0.6, lineage=mode)
        outs[mode] = bs.search(Context(params, batch, train=False))
    np.testing.assert_allclose(
        np.asarray(outs["on"].scores), np.asarray(outs["off"].scores),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(outs["on"].token_ids),
        np.asarray(outs["off"].token_ids))


def test_rnn_lineage_ensemble_matches_physical(model):
    dec, params, batch = model
    params_b = init_all_params(
        collect_parts([dec]), jax.random.PRNGKey(5))
    ctxs = [Context(params, batch, train=False),
            Context(params_b, batch, train=False)]
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(
            name=f"rlen_{mode}", parent_decoder=dec, beam_size=3,
            length_normalization=0.6, lineage=mode)
        outs[mode] = bs.ensemble_search(ctxs)
    np.testing.assert_allclose(
        np.asarray(outs["on"].scores), np.asarray(outs["off"].scores),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(outs["on"].token_ids),
        np.asarray(outs["off"].token_ids))


def test_rnn_lineage_with_coverage_attention(model):
    """Coverage attention is stateful (per-beam coverage vector) and
    keeps TILED constants under lineage decoding; its state must ride
    the in-step parent gather. Equivalence vs the physical path."""
    from neuralmonkey_tpu.models.attention.feed_forward import \
        CoverageAttention
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    vs, vt = Vocabulary(), Vocabulary()
    for s in SRC:
        vs.add_tokenized_text(s)
    for t in TGT:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="cenc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    att = CoverageAttention(name="ccov", encoder=enc)
    dec = Decoder(name="cdec", vocabulary=vt, data_id="target",
                  max_output_len=6, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    ds = Dataset("toy", {"source": SRC, "target": TGT})
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(3))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(
            name=f"cov_{mode}", parent_decoder=dec, beam_size=3,
            length_normalization=0.6, lineage=mode)
        outs[mode] = bs.search(Context(params, batch, train=False))
    np.testing.assert_allclose(
        np.asarray(outs["on"].scores), np.asarray(outs["off"].scores),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(outs["on"].token_ids),
        np.asarray(outs["off"].token_ids))


def test_lineage_default_resolution(model):
    """Pin the lineage default: auto-on for supporting decoders (the
    round-4 decode throughput rests on it), opt-out honored, and
    'on' rejects decoders without support."""
    import os
    dec, params, batch = model
    assert os.environ.get("NM_LINEAGE") in (None, ""), \
        "test requires NM_LINEAGE unset"
    bs = BeamSearchDecoder(name="pin1", parent_decoder=dec, beam_size=2)
    assert bs._use_lineage() is True
    off = BeamSearchDecoder(name="pin2", parent_decoder=dec,
                            beam_size=2, lineage="off")
    assert off._use_lineage() is False

    class _NoLineage:
        lineage_decode = False
        max_output_len = 4
        vocabulary = dec.vocabulary
    forced = BeamSearchDecoder(name="pin3",
                               parent_decoder=_NoLineage(),
                               beam_size=2, lineage="on")
    with pytest.raises(ValueError):
        forced._use_lineage()


def test_beam_attention_histories(model):
    """with_attention=True records each final hypothesis's per-step
    attention; identical between lineage and physical decoding, rows
    are distributions over the source."""
    dec, params, batch = model
    outs = {}
    for mode in ("off", "on"):
        bs = BeamSearchDecoder(name=f"ah_{mode}", parent_decoder=dec,
                               beam_size=3, length_normalization=0.6,
                               lineage=mode)
        out = jax.jit(
            lambda p, b, bs=bs: bs.search(
                Context(p, b, train=False), with_attention=True)
        )(params, batch)
        outs[mode] = jax.tree_util.tree_map(np.asarray, out)
    src_len = batch["enc_input.ids"].shape[1]
    for mode, out in outs.items():
        att = out.attention
        assert att.shape == (len(SRC), 3, dec.max_output_len, src_len)
        for b in range(len(SRC)):
            for k in range(3):
                n = int(out.lengths[b, k])
                if n:
                    np.testing.assert_allclose(
                        att[b, k, :n].sum(-1), np.ones(n), atol=1e-4,
                        err_msg=f"{mode} b={b} k={k}")
    np.testing.assert_array_equal(outs["on"].token_ids,
                                  outs["off"].token_ids)
    for b in range(len(SRC)):
        for k in range(3):
            n = int(outs["on"].lengths[b, k])
            np.testing.assert_allclose(
                outs["on"].attention[b, k, :n],
                outs["off"].attention[b, k, :n], atol=1e-5)


def test_beam_runner_attention_aux(model):
    """BeamSearchRunner(visualize_attention=True) surfaces per-example
    attention matrices in ExecutionResult.aux (attention-map parity
    with the greedy runner)."""
    dec, params, batch = model
    bs = BeamSearchDecoder(name="bs_viz", parent_decoder=dec,
                           beam_size=3, length_normalization=0.6)
    runner = BeamSearchRunner(output_series="target", decoder=bs,
                              visualize_attention=True)
    fetched = jax.jit(
        lambda p, b: runner.fetches(Context(p, b, train=False))
    )(params, batch)
    fetched = jax.tree_util.tree_map(np.asarray, fetched)
    result = runner.collect_results(fetched, len(SRC))
    assert result.aux is not None and "attention" in result.aux
    maps = result.aux["attention"]
    assert len(maps) == len(SRC)
    for mat, length in zip(maps,
                           np.asarray(fetched["lengths"])[:, 0]):
        assert mat.shape[0] == int(length)
        assert mat.shape[1] == batch["enc_input.ids"].shape[1]
