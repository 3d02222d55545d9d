"""SPMD-composable Pallas kernels (VERDICT r2 item 1).

Round 2 turned every Pallas kernel off the moment the mesh had two
devices. Now the dispatch sites shard_map-wrap each kernel over the
runtime's ('data'[, 'model']) mesh — batch manual over 'data', heads
over 'model' — so the per-device body is exactly the single-chip
kernel. These tests run the kernels in interpret mode on the virtual
8-device CPU mesh and assert (a) the Pallas path actually engaged
(call counters on the kernel entry points) and (b) outputs AND
gradients match the pure-JAX paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from neuralmonkey_tpu.ops import beam_select, kernel_config, nn
from neuralmonkey_tpu.ops import pallas_attention as pa
from neuralmonkey_tpu.ops import pallas_rnn
from neuralmonkey_tpu.ops.attention import (attention_bias_from_mask,
                                            causal_bias,
                                            dot_product_attention,
                                            mha_init,
                                            multi_head_attention)
from neuralmonkey_tpu.ops.rnn import unidirectional_rnn

RNG = np.random.RandomState(7)


@pytest.fixture(autouse=True)
def pallas_forced(monkeypatch):
    """Force kernels on (interpret mode on CPU) and clean the mesh
    registry afterwards."""
    monkeypatch.setenv("NM_USE_PALLAS", "1")
    kernel_config._use_pallas_cached.cache_clear()
    yield
    kernel_config.note_mesh(None)
    kernel_config._use_pallas_cached.cache_clear()


def _mesh(shape=(8,), names=("data",)):
    devs = np.array(jax.devices()[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _mask(batch, time, lengths):
    mask = np.zeros((batch, time), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :l] = 1.0
    return jnp.asarray(mask)


def _count_calls(monkeypatch, module, name):
    calls = {"n": 0}
    real = getattr(module, name)

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(module, name, counted)
    return calls


# ------------------------------------------------------------------ #
# flash attention
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("mesh_spec", [((8,), ("data",)),
                                       ((4, 2), ("data", "model"))])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_sharded_matches_reference(monkeypatch, mesh_spec,
                                         causal):
    kernel_config.note_mesh(_mesh(*mesh_spec))
    calls = _count_calls(monkeypatch, pa, "_flash_attention_pallas")
    batch, heads, t, dim = 8, 4, 16, 8
    q = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 9, 16, 3, 7, 16, 5])

    assert pa.flash_sharded_ok(q)
    out = jax.jit(lambda *a: pa.flash_attention_sharded(*a, causal))(
        q, k, v, mask)
    bias = attention_bias_from_mask(mask)
    if causal:
        bias = bias + causal_bias(t)
    ref = dot_product_attention(q, k, v, bias)
    assert calls["n"] > 0, "Pallas path did not engage"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_flash_sharded_grads_match_reference():
    kernel_config.note_mesh(_mesh((4, 2), ("data", "model")))
    batch, heads, t, dim = 8, 4, 16, 8
    q = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 9, 16, 3, 7, 16, 5])
    cot = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) * cot)

    g_shard = jax.jit(jax.grad(
        loss(lambda q_, k_, v_: pa.flash_attention_sharded(
            q_, k_, v_, mask, True)), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        loss(lambda q_, k_, v_: pa._reference_flash(
            q_, k_, v_, mask, True)), argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(g_shard, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_mha_routes_to_sharded_flash(monkeypatch):
    """The product dispatch (multi_head_attention) must pick the
    sharded flash path on a data mesh — and fall back to dense when
    the batch does not divide it."""
    kernel_config.note_mesh(_mesh())
    calls = _count_calls(monkeypatch, pa, "_flash_attention_pallas")
    params = mha_init(jax.random.PRNGKey(0), 16, 16, 16)
    x = jnp.asarray(RNG.randn(8, 12, 16), jnp.float32)
    mask = _mask(8, 12, [12, 8, 5, 12, 3, 7, 10, 2])
    out = jax.jit(lambda x_: multi_head_attention(
        params, x_, x_, x_, 4, key_mask=mask))(x)
    assert calls["n"] > 0
    assert out.shape == (8, 12, 16)
    # batch 6 does not divide dp=8 -> dense fallback, no new calls
    before = calls["n"]
    x6, m6 = x[:6], mask[:6]
    out6 = jax.jit(lambda x_: multi_head_attention(
        params, x_, x_, x_, 4, key_mask=m6))(x6)
    assert calls["n"] == before
    assert out6.shape == (6, 12, 16)


# ------------------------------------------------------------------ #
# fused RNN scans
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_rnn_scan_sharded_matches_xla(monkeypatch, kind):
    kernel_config.note_mesh(_mesh())
    cell = (nn.GRUCell(6, 5) if kind == "gru"
            else nn.LSTMCell(6, 5))
    entry = "_gru_scan_pallas" if kind == "gru" else "_lstm_scan_pallas"
    calls = _count_calls(monkeypatch, pallas_rnn, entry)
    params = cell.init(jax.random.PRNGKey(0))
    inputs = jnp.asarray(RNG.randn(8, 7, 6), jnp.float32)
    mask = _mask(8, 7, [7, 4, 2, 7, 1, 5, 6, 3])

    out, final = jax.jit(lambda p, x, m: unidirectional_rnn(
        cell, p, x, m))(params, inputs, mask)
    assert calls["n"] > 0, "Pallas scan did not engage"
    ref_out, ref_final = unidirectional_rnn(cell, params, inputs,
                                            mask, allow_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=1e-5)


def test_gru_scan_sharded_bptt_grads_match_xla():
    """Param gradients cross the shard_map boundary as replicated
    inputs — their cotangents must come back psummed over 'data'
    (the BPTT correctness of the whole wrap)."""
    kernel_config.note_mesh(_mesh())
    cell = nn.GRUCell(6, 5)
    params = cell.init(jax.random.PRNGKey(0))
    inputs = jnp.asarray(RNG.randn(8, 7, 6), jnp.float32)
    mask = _mask(8, 7, [7, 4, 2, 7, 1, 5, 6, 3])
    cot = jnp.asarray(RNG.randn(8, 7, 5), jnp.float32)

    def loss(allow):
        def inner(p, x):
            out, final = unidirectional_rnn(cell, p, x, mask,
                                            allow_pallas=allow)
            return jnp.sum(out * cot) + jnp.sum(final)
        return inner

    gp, gx = jax.jit(jax.grad(loss(True), argnums=(0, 1)))(
        params, inputs)
    gp_ref, gx_ref = jax.grad(loss(False), argnums=(0, 1))(
        params, inputs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=2e-5)
    for key in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[key]), np.asarray(gp_ref[key]), atol=2e-5,
            err_msg=f"param grad {key}")


# ------------------------------------------------------------------ #
# beam-selection reductions
# ------------------------------------------------------------------ #
def test_rowmax_lse_sharded_matches_reference(monkeypatch):
    kernel_config.note_mesh(_mesh())
    calls = _count_calls(monkeypatch, beam_select,
                         "_rowmax_lse_pallas")
    x = jnp.asarray(RNG.randn(64, 4 * 128), jnp.float32)
    rowmax, lse = jax.jit(beam_select.rowmax_lse)(x)
    assert calls["n"] > 0
    want_rm, want_lse = beam_select._rowmax_lse_reference(x)
    np.testing.assert_allclose(np.asarray(rowmax),
                               np.asarray(want_rm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=1e-5)
    # 8 rows / 8 shards = 1 row per shard: not a sublane multiple ->
    # reference fallback, not a crash
    before = calls["n"]
    small = jnp.asarray(RNG.randn(8, 128), jnp.float32)
    beam_select.rowmax_lse(small)
    assert calls["n"] == before


def test_fused_logits_sharded_matches_reference(monkeypatch):
    kernel_config.note_mesh(_mesh())
    calls = _count_calls(monkeypatch, beam_select, "_fused_pallas")
    x = jnp.asarray(RNG.randn(64, 128), jnp.float32)
    w = jnp.asarray(RNG.randn(128, 640) * 0.1, jnp.float32)
    b = jnp.asarray(RNG.randn(1, 640), jnp.float32)
    logits, rowmax, lse = jax.jit(
        beam_select.fused_logits_rowmax_lse)(x, w, b)
    assert calls["n"] > 0
    want = beam_select._fused_logits_rowmax_lse_reference(x, w, b)
    for got, ref in zip((logits, rowmax, lse), want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
    # a >1 'model' axis keeps the unfused/reference path (the vocab
    # columns may be TP-sharded there) — no crash, no kernel call
    kernel_config.note_mesh(_mesh((4, 2), ("data", "model")))
    before = calls["n"]
    beam_select.fused_logits_rowmax_lse(x, w, b)
    assert calls["n"] == before


def test_small_topk_sharded_matches_reference(monkeypatch):
    kernel_config.note_mesh(_mesh())
    calls = _count_calls(monkeypatch, beam_select, "_topk_pallas")
    x = jnp.asarray(RNG.randn(16, 300), jnp.float32)
    vals, idxs = jax.jit(lambda x_: beam_select.small_topk(x_, 5))(x)
    assert calls["n"] > 0
    want_v, want_i = jax.lax.top_k(x, 5)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs),
                                  np.asarray(want_i))


# ------------------------------------------------------------------ #
# fused Bahdanau step
# ------------------------------------------------------------------ #
def test_bahdanau_sharded_matches_reference(monkeypatch):
    kernel_config.note_mesh(_mesh())
    calls = _count_calls(monkeypatch, pa, "_fused_bahdanau_pallas")
    b, t, a, d = 8, 6, 5, 4
    keys = jnp.asarray(RNG.randn(b, t, a), jnp.float32)
    states = jnp.asarray(RNG.randn(b, t, d), jnp.float32)
    mask = _mask(b, t, [6, 4, 2, 6, 1, 5, 3, 6])
    pq = jnp.asarray(RNG.randn(b, a), jnp.float32)
    sv = jnp.asarray(RNG.randn(a), jnp.float32)

    ctx, w = jax.jit(pa.bahdanau_step_dispatch)(keys, states, mask,
                                                pq, sv)
    assert calls["n"] > 0
    ref_ctx, ref_w = pa._reference_bahdanau(keys, states, mask, pq, sv)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                               atol=1e-5)


# ------------------------------------------------------------------ #
# end-to-end: DP training with kernels ON matches kernels OFF
# ------------------------------------------------------------------ #
def test_dp_training_with_kernels_matches_pure_jax(monkeypatch):
    """The r2 DP-grads-match guarantee, now with the kernels engaged:
    an 8-way data-parallel train + decode through the product runtime
    must give the same trajectory with Pallas kernels on (interpret,
    shard_map-wrapped) as with them off."""
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.models.attention.feed_forward import \
        Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    from neuralmonkey_tpu.runners.runner import GreedyRunner
    from neuralmonkey_tpu.runtime import TPUManager
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    rng = np.random.RandomState(3)
    src = [[f"s{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(16)]
    tgt = [[f"t{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(16)]
    vs, vt = Vocabulary(), Vocabulary()
    for s in src:
        vs.add_tokenized_text(s)
    for t in tgt:
        vt.add_tokenized_text(t)
    ds = Dataset("toy", {"source": src, "target": tgt})

    calls = _count_calls(monkeypatch, pa, "_fused_bahdanau_pallas")
    results = {}
    for env in ("1", "0"):
        monkeypatch.setenv("NM_USE_PALLAS", env)
        kernel_config._use_pallas_cached.cache_clear()
        enc = SentenceEncoder(name=f"e{env}", vocabulary=vs,
                              data_id="source", embedding_size=8,
                              rnn_size=6)
        att = Attention(name=f"a{env}", encoder=enc)
        dec = Decoder(name=f"d{env}", vocabulary=vt, data_id="target",
                      max_output_len=8, rnn_size=7, encoders=[enc],
                      attentions=[att], embedding_size=8)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        runner = GreedyRunner(output_series="target", decoder=dec)
        manager = TPUManager(random_seed=0)
        assert kernel_config.use_pallas() == (env == "1")
        manager.initialize_model_parts([trainer, runner], seed=0)
        losses = [manager.train_on_batch(trainer, ds,
                                         batch_size=16)["loss"]
                  for _ in range(2)]
        before_decode = calls["n"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        if env == "1":  # kernels engaged in train AND decode
            assert before_decode > 0
            assert calls["n"] > before_decode
        else:
            assert calls["n"] == results["1"][2]
        results[env] = (losses, outs, calls["n"])
    l_on, o_on = results["1"][:2]
    l_off, o_off = results["0"][:2]
    # the kernels' f32 reassociation differences accumulate through
    # the recurrent decode (measured ~1e-4 rel on the first loss), so
    # this is an epsilon loss bound; greedy argmax on a 2-step-trained
    # model flips on such noise, so decode is checked for shape/vocab
    # validity (per-kernel decode exactness is golden-tested above)
    assert l_on[0] == pytest.approx(l_off[0], rel=1e-3)
    assert l_on[1] == pytest.approx(l_off[1], rel=1e-3)
    assert len(o_on) == len(o_off) == 16
    vocab_words = {f"t{i}" for i in range(20)}
    for sent in o_on:
        assert all(w in vocab_words for w in sent)


# ------------------------------------------------------------------ #
# meshes with pipe/expert/context axes (VERDICT r3 item 3)
# ------------------------------------------------------------------ #
# Round 3 limited the wrap to axis_names <= {data, model}; a PP, EP,
# or CP mesh silently lost every kernel. The wrap plan now covers
# them: at top level the shard_map is fully manual with the extra
# axes replicated (operands are only data(/model)-sharded, so the
# replication matches GSPMD semantics); inside a partial-auto body
# (a GPipe stage) a NESTED shard_map makes the still-auto axes manual.

EXTRA_MESHES = [((4, 2), ("data", "pipe")),
                ((4, 2), ("data", "expert")),
                ((4, 2), ("data", "context")),
                ((2, 2, 2), ("data", "pipe", "model"))]


@pytest.mark.parametrize("mesh_spec", EXTRA_MESHES)
def test_flash_sharded_on_extra_axis_mesh(monkeypatch, mesh_spec):
    kernel_config.note_mesh(_mesh(*mesh_spec))
    assert kernel_config.use_pallas()
    calls = _count_calls(monkeypatch, pa, "_flash_attention_pallas")
    batch, heads, t, dim = 8, 4, 16, 8
    q = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 9, 16, 3, 7, 16, 5])
    assert pa.flash_sharded_ok(q)
    out = jax.jit(lambda *a: pa.flash_attention_sharded(*a, True))(
        q, k, v, mask)
    assert calls["n"] > 0, "Pallas path did not engage"
    ref = pa._reference_flash(q, k, v, mask, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mesh_spec", EXTRA_MESHES[:3])
def test_rnn_and_beam_kernels_on_extra_axis_mesh(monkeypatch,
                                                 mesh_spec):
    kernel_config.note_mesh(_mesh(*mesh_spec))
    scan_calls = _count_calls(monkeypatch, pallas_rnn,
                              "_gru_scan_pallas")
    cell = nn.GRUCell(6, 5)
    params = cell.init(jax.random.PRNGKey(0))
    inputs = jnp.asarray(RNG.randn(8, 7, 6), jnp.float32)
    mask = _mask(8, 7, [7, 4, 2, 7, 1, 5, 6, 3])
    out, final = jax.jit(lambda p, x, m: unidirectional_rnn(
        cell, p, x, m))(params, inputs, mask)
    assert scan_calls["n"] > 0, "Pallas scan did not engage"
    ref_out, ref_final = unidirectional_rnn(cell, params, inputs,
                                            mask, allow_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)

    topk_calls = _count_calls(monkeypatch, beam_select, "_topk_pallas")
    x = jnp.asarray(RNG.randn(16, 300), jnp.float32)
    vals, idxs = jax.jit(lambda x_: beam_select.small_topk(x_, 5))(x)
    assert topk_calls["n"] > 0
    want_v, want_i = jax.lax.top_k(x, 5)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs),
                                  np.asarray(want_i))

    rml_calls = _count_calls(monkeypatch, beam_select,
                             "_rowmax_lse_pallas")
    y = jnp.asarray(RNG.randn(64, 4 * 128), jnp.float32)
    # fresh lambda: jax.jit on the raw module function would reuse the
    # trace from an earlier test at this shape and skip the counter
    rowmax, lse = jax.jit(lambda y_: beam_select.rowmax_lse(y_))(y)
    assert rml_calls["n"] > 0
    want_rm, want_lse = beam_select._rowmax_lse_reference(y)
    np.testing.assert_allclose(np.asarray(rowmax),
                               np.asarray(want_rm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=1e-5)


def test_nested_wrap_inside_manual_body(monkeypatch):
    """Inside a partial-auto shard_map body (only 'pipe' manual — the
    GPipe stage shape), the dispatch must build a NESTED shard_map
    over the still-auto 'data' axis, and gradients must flow through
    the inner custom-vjp kernel."""
    mesh = _mesh((4, 2), ("data", "pipe"))
    kernel_config.note_mesh(mesh)
    calls = _count_calls(monkeypatch, pa, "_flash_attention_pallas")
    batch, heads, t, dim = 8, 2, 16, 8
    q = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 9, 16, 3, 7, 16, 5])

    def stage_body(q_, k_, v_, m_):
        plan = kernel_config.spmd_wrap_plan()
        assert plan is not None and plan.axis_names == {"data"}
        return pa.flash_attention_sharded(q_, k_, v_, m_, False)

    wrapped = jax.shard_map(
        stage_body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=P(), axis_names={"pipe"}, check_vma=False)
    out = jax.jit(wrapped)(q, k, v, mask)
    assert calls["n"] > 0, "nested Pallas path did not engage"
    ref = pa._reference_flash(q, k, v, mask, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    g = jax.jit(jax.grad(
        lambda q_: jnp.sum(wrapped(q_, k, v, mask) ** 2)))(q)
    g_ref = jax.grad(
        lambda q_: jnp.sum(pa._reference_flash(
            q_, k, v, mask, False) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_pipelined_training_with_kernels_matches_pure_jax(monkeypatch):
    """End-to-end: a 4-stage pipelined transformer (dp=2 x pp=4) with
    kernels ON (interpret, nested wrap inside the stage bodies) trains
    to the same losses as kernels OFF, and the flash kernel actually
    engaged inside the pipeline."""
    from neuralmonkey_tpu.models.decoders.transformer import \
        TransformerDecoder
    from neuralmonkey_tpu.models.encoders.transformer import \
        TransformerEncoder
    from neuralmonkey_tpu.parallel.pipeline import disable_pipeline
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.runners.runner import GreedyRunner
    from neuralmonkey_tpu.runtime import TPUManager
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vocab = Vocabulary()
    for i in range(24):
        vocab.add_word(f"w{i}")
    ds = Dataset("toy", {
        "source": [[f"w{i}", f"w{i + 1}", f"w{i + 2}"]
                   for i in range(16)],
        "target": [[f"w{i}", f"w{i + 3}"] for i in range(16)],
    })

    calls = _count_calls(monkeypatch, pa, "_flash_attention_pallas")
    res = {}
    for env in ("1", "0"):
        monkeypatch.setenv("NM_USE_PALLAS", env)
        kernel_config._use_pallas_cached.cache_clear()
        enc = TransformerEncoder(
            name="ppk_src", vocabulary=vocab, data_id="source",
            embedding_size=16, ff_hidden_size=32, depth=4, n_heads=4,
            dropout_keep_prob=1.0, pipeline_stages=4)
        dec = TransformerDecoder(
            name="ppk_tgt", vocabulary=vocab, data_id="target",
            encoders=[enc], embedding_size=16, ff_hidden_size=32,
            depth=4, n_heads_self=4, n_heads_enc=4, max_output_len=6,
            tie_embeddings=False, dropout_keep_prob=1.0,
            pipeline_stages=4)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        runner = GreedyRunner(output_series="target", decoder=dec)
        manager = TPUManager(num_pipeline_stages=4, random_seed=0)
        assert kernel_config.use_pallas() == (env == "1")
        manager.initialize_model_parts([trainer, runner], seed=0)
        before = calls["n"]
        losses = [manager.train_on_batch(trainer, ds,
                                         batch_size=16)["loss"]
                  for _ in range(2)]
        if env == "1":
            assert calls["n"] > before, \
                "flash kernel did not engage under the pipeline"
        else:
            assert calls["n"] == before
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[env] = (losses, outs)
        disable_pipeline()
    l_on, l_off = res["1"][0], res["0"][0]
    assert l_on[0] == pytest.approx(l_off[0], rel=1e-3)
    assert l_on[1] == pytest.approx(l_off[1], rel=1e-3)
    assert len(res["1"][1]) == len(res["0"][1]) == 16
