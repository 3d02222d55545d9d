"""Fused softmax-xent training tail (ops/fused_xent.py).

Golden tests in Pallas interpret mode (conftest forces CPU): values
and gradients of the fused custom-VJP path must match the pure-JAX
twin — both weight layouts, with and without label smoothing, and
with a non-lane-aligned vocabulary (exercises the -1e9 pad columns).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.ops import fused_xent as fx
from neuralmonkey_tpu.ops import kernel_config


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("NM_USE_PALLAS", "1")
    # the fused tail is OPT-IN since the round-10 A/B measured it
    # end-to-end slower than XLA's materialized path (fused_xent
    # module docstring) — these tests cover the kernel itself, so
    # they opt in; tests that exercise the "0"/unset gate override
    monkeypatch.setenv("NM_FUSED_XENT", "1")
    kernel_config._use_pallas_cached.cache_clear()
    # a TPUManager built by ANY earlier test leaves its mesh in the
    # kernel registry (by-design process-global); the single-device
    # seam tests here must not inherit it — with a stale 8-way data
    # plan their 32 token rows fail the per-shard row gate and the
    # fused tail silently falls back ("did not engage" flake)
    kernel_config.note_mesh(None)
    yield
    kernel_config.note_mesh(None)
    kernel_config._use_pallas_cached.cache_clear()


def _operands(n=64, d=128, v=300, transposed=False, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.3)
    wshape = (v, d) if transposed else (d, v)
    w = jnp.asarray(rng.randn(*wshape).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(v).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.randint(0, v, size=(n,)), jnp.int32)
    return x, w, b, targets


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("eps", [0.0, 0.1])
def test_fused_xent_value_matches_reference(transposed, eps):
    x, w, b, targets = _operands(transposed=transposed)
    got = jax.jit(lambda *a: fx.fused_softmax_xent(
        *a, eps=eps, transposed=transposed))(x, w, b, targets)
    want = fx.xent_reference(x, w, b, targets, eps, transposed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("eps", [0.0, 0.1])
def test_fused_xent_grads_match_reference(transposed, eps):
    x, w, b, targets = _operands(transposed=transposed, seed=1)
    gmask = jnp.asarray(
        np.random.RandomState(2).rand(x.shape[0]).astype(np.float32))

    def loss(fn):
        def inner(x, w, b):
            return jnp.sum(fn(x, w, b, targets) * gmask)
        return inner

    g_fused = jax.jit(jax.grad(loss(
        lambda x, w, b, t: fx.fused_softmax_xent(
            x, w, b, t, eps=eps, transposed=transposed)),
        argnums=(0, 1, 2)))(x, w, b)
    g_ref = jax.grad(loss(
        lambda x, w, b, t: fx.xent_reference(
            x, w, b, t, eps, transposed)),
        argnums=(0, 1, 2))(x, w, b)
    for got, want, name in zip(g_fused, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-6,
            err_msg=name)


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_xent_bf16_operands(transposed):
    """bf16 x/w (the policy's use-site cast; bias stays f32): values
    and gradients match the pure-JAX twin on the SAME bf16 operands,
    and the cotangents come back in the primal dtypes."""
    x, w, b, targets = _operands(transposed=transposed, seed=5)
    x = x.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    assert fx.eligible(x.shape[0], x.shape[1], x.dtype, w.dtype)
    got = jax.jit(lambda *a: fx.fused_softmax_xent(
        *a, eps=0.1, transposed=transposed))(x, w, b, targets)
    want = fx.xent_reference(x, w, b, targets, 0.1, transposed)
    assert got.dtype == jnp.float32         # loss stays f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    gmask = jnp.asarray(
        np.random.RandomState(6).rand(x.shape[0]).astype(np.float32))

    def loss(fn):
        def inner(x, w, b):
            return jnp.sum(fn(x, w, b, targets) * gmask)
        return inner

    g_fused = jax.jit(jax.grad(loss(
        lambda x, w, b, t: fx.fused_softmax_xent(
            x, w, b, t, eps=0.1, transposed=transposed)),
        argnums=(0, 1, 2)))(x, w, b)
    g_ref = jax.grad(loss(
        lambda x, w, b, t: fx.xent_reference(x, w, b, t, 0.1,
                                             transposed)),
        argnums=(0, 1, 2))(x, w, b)
    assert g_fused[0].dtype == jnp.bfloat16
    assert g_fused[1].dtype == jnp.bfloat16
    assert g_fused[2].dtype == jnp.float32
    for got_g, want_g, name in zip(g_fused, g_ref,
                                   ("dx", "dw", "db")):
        a = np.asarray(got_g, np.float32)
        r = np.asarray(want_g, np.float32)
        scale = max(float(np.max(np.abs(r))), 1e-6)
        assert float(np.max(np.abs(a - r))) / scale < 1e-2, name


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_xent_mixed_f32_states_bf16_weights(transposed):
    """The policy's actual training configuration: f32 states (the
    output layer norm upcasts) against bf16 use-site weights. The
    kernels promote to uniform f32 — values and grads match XLA's
    mixed-dot promotion in the reference twin."""
    x, w, b, targets = _operands(transposed=transposed, seed=8)
    w = w.astype(jnp.bfloat16)
    assert fx.eligible(x.shape[0], x.shape[1], x.dtype, w.dtype)
    got = jax.jit(lambda *a: fx.fused_softmax_xent(
        *a, eps=0.1, transposed=transposed))(x, w, b, targets)
    want = fx.xent_reference(x, w, b, targets, 0.1, transposed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    gmask = jnp.asarray(
        np.random.RandomState(6).rand(x.shape[0]).astype(np.float32))

    def loss(fn):
        def inner(x, w, b):
            return jnp.sum(fn(x, w, b, targets) * gmask)
        return inner

    g_fused = jax.jit(jax.grad(loss(
        lambda x, w, b, t: fx.fused_softmax_xent(
            x, w, b, t, eps=0.1, transposed=transposed)),
        argnums=(0, 1, 2)))(x, w, b)
    g_ref = jax.grad(loss(
        lambda x, w, b, t: fx.xent_reference(x, w, b, t, 0.1,
                                             transposed)),
        argnums=(0, 1, 2))(x, w, b)
    assert g_fused[0].dtype == jnp.float32
    assert g_fused[1].dtype == jnp.bfloat16
    for got_g, want_g, name in zip(g_fused, g_ref,
                                   ("dx", "dw", "db")):
        a = np.asarray(got_g, np.float32)
        r = np.asarray(want_g, np.float32)
        scale = max(float(np.max(np.abs(r))), 1e-6)
        assert float(np.max(np.abs(a - r))) / scale < 1e-2, name


def test_fused_xent_lane_aligned_vocab_no_pad():
    """V already a tile multiple: the pad path is a no-op."""
    x, w, b, targets = _operands(v=512, seed=3)
    got = jax.jit(lambda *a: fx.fused_softmax_xent(*a, eps=0.1))(
        x, w, b, targets)
    want = fx.xent_reference(x, w, b, targets, 0.1, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_fused_xent_ineligible_shapes_fall_back():
    # odd row count -> reference path (still correct)
    x, w, b, targets = _operands(n=13, seed=4)
    got = fx.fused_softmax_xent(x, w, b, targets, eps=0.1)
    want = fx.xent_reference(x, w, b, targets, 0.1, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6)


def test_fused_xent_env_gate(monkeypatch):
    monkeypatch.setenv("NM_FUSED_XENT", "0")
    assert not fx.eligible(64, 128, jnp.float32, jnp.float32)


def test_fused_xent_default_is_off(monkeypatch):
    """Unset env -> the materialized XLA tail (the fused path is a
    measured end-to-end negative; opting in is explicit)."""
    monkeypatch.delenv("NM_FUSED_XENT", raising=False)
    assert not fx.eligible(64, 128, jnp.float32, jnp.float32)


def _tiny_transformer(tie):
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.models.decoders.transformer import \
        TransformerDecoder
    from neuralmonkey_tpu.models.encoders.transformer import \
        TransformerEncoder
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vocab = Vocabulary()
    for i in range(40):
        vocab.add_word(f"w{i}")
    enc = TransformerEncoder(
        name="fx_src", vocabulary=vocab, data_id="source",
        embedding_size=128, ff_hidden_size=64, depth=1, n_heads=4,
        dropout_keep_prob=1.0)
    dec = TransformerDecoder(
        name="fx_tgt", vocabulary=vocab, data_id="target",
        encoders=[enc], embedding_size=128, ff_hidden_size=64,
        depth=1, n_heads_self=4, n_heads_enc=4, max_output_len=8,
        tie_embeddings=tie, label_smoothing=0.1,
        dropout_keep_prob=1.0)
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    batch = {
        "fx_src_input.ids": jnp.asarray(
            rng.randint(4, 40, size=(4, 6)), jnp.int32),
        "fx_src_input.mask": jnp.ones((4, 6), jnp.float32),
        "fx_tgt.train_inputs": jnp.asarray(
            rng.randint(4, 40, size=(4, 8)), jnp.int32),
        "fx_tgt.train_targets": jnp.asarray(
            rng.randint(4, 40, size=(4, 8)), jnp.int32),
        "fx_tgt.train_mask": jnp.asarray(
            (rng.rand(4, 8) > 0.2).astype(np.float32)),
    }
    return dec, params, batch, Context


@pytest.mark.parametrize("tie", [True, False])
def test_transformer_train_loss_fused_matches_fallback(monkeypatch,
                                                       tie):
    """End to end through the decoder seam: the transformer's
    train_loss and its parameter gradients are identical (interpret
    mode) whether the fused tail engages or the logits materialize.
    The call counter proves the fused path actually ran."""
    dec, params, batch, Context = _tiny_transformer(tie)
    calls = {"n": 0}
    real = fx._fused

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(fx, "_fused", counted)

    def run():
        def loss_fn(p):
            ctx = Context(p, batch, train=True)
            return dec.train_loss(ctx)
        val, grads = jax.value_and_grad(loss_fn)(params)
        return np.asarray(val), grads

    monkeypatch.setenv("NM_FUSED_XENT", "1")
    val_on, g_on = run()
    assert calls["n"] > 0, "fused tail did not engage"
    monkeypatch.setenv("NM_FUSED_XENT", "0")
    val_off, g_off = run()

    np.testing.assert_allclose(val_on, val_off, rtol=2e-6, atol=2e-7)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = jax.tree_util.tree_leaves(g_off)
    for (path, a), b in zip(flat_on, flat_off):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_rnn_decoder_train_loss_fused_matches_fallback(monkeypatch):
    """Same seam through the RNN decoder (models/decoders/decoder.py
    train_prelogit_states): maxout prelogits at a lane-aligned width
    feed the fused tail; loss and grads match the fallback."""
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vocab = Vocabulary()
    for i in range(40):
        vocab.add_word(f"w{i}")
    enc = SentenceEncoder(
        name="fxr_src", vocabulary=vocab, data_id="source",
        embedding_size=32, rnn_size=64, dropout_keep_prob=1.0)
    dec = Decoder(
        name="fxr_tgt", vocabulary=vocab, data_id="target",
        encoders=[enc], embedding_size=64, rnn_size=128,
        max_output_len=8, maxout_size=128, label_smoothing=0.1,
        dropout_keep_prob=1.0)
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(1))
    rng = np.random.RandomState(9)
    batch = {
        "fxr_src_input.ids": jnp.asarray(
            rng.randint(4, 40, size=(4, 6)), jnp.int32),
        "fxr_src_input.mask": jnp.ones((4, 6), jnp.float32),
        "fxr_tgt.train_inputs": jnp.asarray(
            rng.randint(4, 40, size=(4, 8)), jnp.int32),
        "fxr_tgt.train_targets": jnp.asarray(
            rng.randint(4, 40, size=(4, 8)), jnp.int32),
        "fxr_tgt.train_mask": jnp.asarray(
            (rng.rand(4, 8) > 0.2).astype(np.float32)),
    }
    calls = {"n": 0}
    real = fx._fused

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(fx, "_fused", counted)

    def run():
        def loss_fn(p):
            ctx = Context(p, batch, train=True)
            return dec.train_loss(ctx)
        val, grads = jax.value_and_grad(loss_fn)(params)
        return np.asarray(val), grads

    monkeypatch.setenv("NM_FUSED_XENT", "1")
    val_on, g_on = run()
    assert calls["n"] > 0, "fused tail did not engage"
    monkeypatch.setenv("NM_FUSED_XENT", "0")
    val_off, g_off = run()
    np.testing.assert_allclose(val_on, val_off, rtol=2e-6, atol=2e-7)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_on),
            jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_fused_tail_engages_under_bf16_policy(monkeypatch):
    """Under ``compute_dtype=bfloat16`` the use-site cast makes the
    prelogit states and projection weights bf16 — the fused tail must
    still engage (round-4 bf16 eligibility) and match the unfused
    bf16 run."""
    from neuralmonkey_tpu.ops import policy

    dec, params, batch, Context = _tiny_transformer(tie=True)
    calls = {"n": 0}
    real = fx._fused

    def counted(*a, **k):
        # the output layer norm keeps states f32; the tied projection
        # table carries the policy's use-site bf16 cast
        assert a[1].dtype == jnp.bfloat16, "weights not bf16"
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(fx, "_fused", counted)
    policy.set_compute_dtype("bfloat16")
    try:
        def run():
            def loss_fn(p):
                ctx = Context(p, batch, train=True)
                return dec.train_loss(ctx)
            val, grads = jax.value_and_grad(loss_fn)(params)
            return np.asarray(val), grads

        monkeypatch.setenv("NM_FUSED_XENT", "1")
        val_on, g_on = run()
        assert calls["n"] > 0, "fused tail did not engage under bf16"
        monkeypatch.setenv("NM_FUSED_XENT", "0")
        val_off, g_off = run()
    finally:
        policy.set_compute_dtype(None)
    np.testing.assert_allclose(val_on, val_off, rtol=1e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_on),
            jax.tree_util.tree_leaves(g_off)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(float(np.max(np.abs(b))), 1e-6)
        assert float(np.max(np.abs(a - b))) / scale < 1e-2, \
            jax.tree_util.keystr(path)


def test_fused_xent_engages_on_data_mesh(monkeypatch):
    """Full product path on the 8-device DP mesh: the fused tail's
    shard_map wrap engages inside TPUManager's train step (token rows
    sharded over 'data', w/b replicated, their grads psummed by the
    wrap transpose) and the training trajectory matches the unfused
    run exactly."""
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.models.decoders.transformer import \
        TransformerDecoder
    from neuralmonkey_tpu.models.encoders.transformer import \
        TransformerEncoder
    from neuralmonkey_tpu.runtime import TPUManager
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vocab = Vocabulary()
    for i in range(40):
        vocab.add_word(f"w{i}")
    ds = Dataset("toy", {
        "source": [[f"w{(i + j) % 36}" for j in range(5)]
                   for i in range(16)],
        "target": [[f"w{i % 36}", f"w{(i + 3) % 36}",
                    f"w{(i + 7) % 36}"] for i in range(16)],
    })

    def build():
        enc = TransformerEncoder(
            name="fxd_src", vocabulary=vocab, data_id="source",
            embedding_size=128, ff_hidden_size=64, depth=1,
            n_heads=4, dropout_keep_prob=1.0)
        dec = TransformerDecoder(
            name="fxd_tgt", vocabulary=vocab, data_id="target",
            encoders=[enc], embedding_size=128, ff_hidden_size=64,
            depth=1, n_heads_self=4, n_heads_enc=4, max_output_len=6,
            label_smoothing=0.1, dropout_keep_prob=1.0)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        return trainer

    calls = {"n": 0}
    real = fx._fused

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(fx, "_fused", counted)
    losses = {}
    for env in ("1", "0"):
        monkeypatch.setenv("NM_FUSED_XENT", env)
        trainer = build()
        manager = TPUManager(random_seed=0)   # ('data', 8) mesh
        manager.initialize_model_parts([trainer], seed=0)
        before = calls["n"]
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        if env == "1":
            assert calls["n"] > before, "fused tail did not engage"
        else:
            assert calls["n"] == before
        losses[env] = (l1, l2)
    assert losses["1"][0] == pytest.approx(losses["0"][0], rel=1e-5)
    assert losses["1"][1] == pytest.approx(losses["0"][1], rel=1e-5)
