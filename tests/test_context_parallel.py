"""Ring-attention context parallelism (parallel/ring_attention.py).

The reference framework is single-device with vanilla O(T²) attention
(SURVEY.md §3 parallelism census); context parallelism is a TPU-native
scaling extension over the reserved sequence mesh axis (SURVEY.md §6).
These tests run on the 8-device virtual CPU mesh from conftest.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.models.decoders.transformer import \
    TransformerDecoder
from neuralmonkey_tpu.models.encoders.transformer import \
    TransformerEncoder
from neuralmonkey_tpu.ops.attention import (attention_bias_from_mask,
                                            causal_bias,
                                            dot_product_attention)
from neuralmonkey_tpu.parallel import ring_attention as ring_mod
from neuralmonkey_tpu.parallel.ring_attention import (
    blockwise_dropout_mask, context_parallel_mesh,
    disable_context_parallel, enable_context_parallel, ring_attention,
    ring_dropout_eligible, ring_eligible)
from neuralmonkey_tpu.runners.runner import GreedyRunner
from neuralmonkey_tpu.runtime import TPUManager
from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
    CrossEntropyTrainer
from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
from neuralmonkey_tpu.vocabulary import Vocabulary


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    disable_context_parallel()


def _mesh(dp=2, cp=4):
    devs = np.array(jax.devices()[:dp * cp]).reshape(dp, cp)
    return jax.sharding.Mesh(devs, ("data", "context"))


def _rand_attention(rng, batch=4, heads=2, tq=16, tk=16, dh=8):
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (batch, heads, tq, dh))
    k = jax.random.normal(ks[1], (batch, heads, tk, dh))
    v = jax.random.normal(ks[2], (batch, heads, tk, dh))
    # ragged validity: every row keeps a random prefix (min 3 so no
    # sentence is fully padded)
    lens = jax.random.randint(ks[3], (batch,), 3, tk + 1)
    mask = (jnp.arange(tk)[None, :] < lens[:, None]).astype(jnp.float32)
    return q, k, v, mask


def _reference(q, k, v, mask, causal):
    bias = attention_bias_from_mask(mask)
    if causal:
        bias = bias + causal_bias(k.shape[2])[:, :, :q.shape[2], :]
    return dot_product_attention(q, k, v, bias)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense_reference(causal):
    enable_context_parallel(_mesh())
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(0))
    got = jax.jit(ring_attention, static_argnames="causal")(
        q, k, v, mask, causal=causal)
    want = _reference(q, k, v, mask, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_cross_attention_shapes():
    """Tq != Tk (decoder cross-attention): both time axes ride the
    ring independently."""
    enable_context_parallel(_mesh())
    q, _, _, _ = _rand_attention(jax.random.PRNGKey(1), tq=8, tk=8)
    _, k, v, mask = _rand_attention(jax.random.PRNGKey(2), tq=24,
                                    tk=24)
    got = jax.jit(ring_attention)(q, k, v, mask)
    want = _reference(q, k, v, mask, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gradients_match_dense(causal):
    """Autodiff through the ring (scan + ppermute transposes) equals
    the dense attention's gradients."""
    enable_context_parallel(_mesh())
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(3))
    w = jax.random.normal(jax.random.PRNGKey(4), q.shape)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) * w)
        return inner

    g_ring = jax.jit(jax.grad(
        loss(lambda q, k, v: ring_attention(q, k, v, mask, causal)),
        argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        loss(lambda q, k, v: _reference(q, k, v, mask, causal)),
        argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-6)


def test_ring_contiguous_causal_fallback_matches_dense():
    """Odd per-device block (12/4 = 3): zigzag is ineligible, the
    contiguous causal schedule must still be exact."""
    enable_context_parallel(_mesh())
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(6), tq=12,
                                    tk=12)
    got = jax.jit(ring_attention, static_argnames="causal")(
        q, k, v, mask, causal=True)
    want = _reference(q, k, v, mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_zigzag_halves_causal_ring_flops():
    """The zigzag schedule's whole point (VERDICT r2 item 4b): the
    contiguous causal ring computes every above-diagonal block only to
    mask it, so zigzag's per-device FLOPs must come in well under —
    asserted via compiled cost analysis (wall-clock is meaningless on
    the virtual mesh)."""
    enable_context_parallel(_mesh(dp=1, cp=8))
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(8), batch=2,
                                    tq=128, tk=128, dh=16)

    def flops(schedule):
        fn = jax.jit(ring_attention,
                     static_argnames=("causal", "schedule"))
        comp = fn.lower(q, k, v, mask, causal=True,
                        schedule=schedule).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return cost["flops"]

    zig, contig = flops("zigzag"), flops("contiguous")
    assert zig < 0.75 * contig, (zig, contig)


def _dense_with_keep(q, k, v, mask, causal, keep, keep_prob):
    """Dense attention applying a GIVEN keep-mask (the blockwise mask
    the ring draws) with dense-dropout semantics."""
    bias = attention_bias_from_mask(mask)
    if causal:
        bias = bias + causal_bias(k.shape[2])[:, :, :q.shape[2], :]
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32
                        ) * scale + bias
    w = jax.nn.softmax(scores, axis=-1)
    w = jnp.where(keep, w / keep_prob, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32
                      ).astype(v.dtype)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq", [16, 12])
def test_ring_dropout_matches_dense_blockwise(causal, tq):
    """Attention dropout inside the ring (VERDICT r2 item 4a): the
    counter-based per-block keep masks reassemble into exactly the
    dense result — across both schedules (tq=16 → zigzag when causal,
    tq=12 → contiguous)."""
    assert ring_dropout_eligible()
    enable_context_parallel(_mesh())
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(9), tq=tq,
                                    tk=tq)
    rng = jax.random.PRNGKey(11)
    keep_prob = 0.75
    got = jax.jit(ring_attention,
                  static_argnames=("causal", "dropout_keep_prob"))(
        q, k, v, mask, causal=causal, dropout_rng=rng,
        dropout_keep_prob=keep_prob)
    keep = blockwise_dropout_mask(rng, keep_prob, q.shape[0],
                                  q.shape[1], tq, tq, 4, causal)
    want = _dense_with_keep(q, k, v, mask, causal, keep, keep_prob)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_dropout_gradients_match_dense(causal=True):
    """Autodiff through the dropped ring equals the dense gradients
    with the same blockwise keep-mask."""
    enable_context_parallel(_mesh())
    q, k, v, mask = _rand_attention(jax.random.PRNGKey(12))
    w = jax.random.normal(jax.random.PRNGKey(13), q.shape)
    rng = jax.random.PRNGKey(14)
    keep_prob = 0.75
    keep = blockwise_dropout_mask(rng, keep_prob, q.shape[0],
                                  q.shape[1], 16, 16, 4, causal)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) * w)
        return inner

    g_ring = jax.jit(jax.grad(
        loss(lambda q, k, v: ring_attention(
            q, k, v, mask, causal, dropout_rng=rng,
            dropout_keep_prob=keep_prob)),
        argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        loss(lambda q, k, v: _dense_with_keep(
            q, k, v, mask, causal, keep, keep_prob)),
        argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-6)


def test_ring_eligibility_guards():
    assert not ring_eligible(16, 16)  # no mesh registered
    enable_context_parallel(_mesh(dp=2, cp=4))
    assert ring_eligible(16, 16)
    assert ring_eligible(8, 24)
    assert not ring_eligible(1, 16)   # decode step: q time = 1
    assert not ring_eligible(16, 6)   # kv axis does not divide


# ---------------------------------------------------------------- #
# end-to-end through the product runtime
# ---------------------------------------------------------------- #
def _vocab(n=28):
    v = Vocabulary()
    for i in range(n):
        v.add_word(f"w{i}")
    return v


def _toy_dataset():
    return Dataset("toy", {
        "source": [[f"w{(i + j) % 24}" for j in range(5)]
                   for i in range(16)],
        "target": [[f"w{i % 24}", f"w{(i + 3) % 24}"]
                   for i in range(16)],
    })


def _build():
    enc = TransformerEncoder(
        name="cp_src", vocabulary=_vocab(), data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4)
    dec = TransformerDecoder(
        name="cp_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=2,
        n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    return trainer, GreedyRunner(output_series="target", decoder=dec)


@pytest.mark.parametrize("tp", [1, 2])
def test_context_parallel_transformer_matches_single_mesh(
        monkeypatch, tp):
    """Full product path: the same transformer trains and decodes on a
    dp×cp(×tp) mesh to the single-mesh trajectory (ring online-softmax
    reassociation ≈ f32 epsilon). The monkeypatched counter proves the
    ring actually engaged on the train steps."""
    calls = {"n": 0}
    real = ring_mod.ring_attention

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(ring_mod, "ring_attention", counted)
    ds = _toy_dataset()
    res = {}
    for cp in (1, 4 // tp * 2):
        trainer, runner = _build()
        manager = TPUManager(num_context_shards=cp,
                             num_model_shards=tp if cp > 1 else 1,
                             random_seed=0)
        assert (context_parallel_mesh() is not None) == (cp > 1)
        manager.initialize_model_parts([trainer, runner], seed=0)
        before = calls["n"]
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        if cp > 1:  # enc self + dec self + dec cross, 2 layers each
            assert calls["n"] > before
        else:
            assert calls["n"] == before
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[cp] = (l1, l2, outs)
        disable_context_parallel()
    keys = sorted(res)
    assert res[keys[0]][0] == pytest.approx(res[keys[1]][0], rel=1e-5)
    assert res[keys[0]][1] == pytest.approx(res[keys[1]][1], rel=1e-5)
    assert res[keys[0]][2] == res[keys[1]][2]


def test_ring_composes_with_remat(monkeypatch):
    """remat=True wraps each transformer layer in jax.checkpoint; the
    ring shard_map must trace inside it and keep gradients equal to
    the non-remat run (the repo's remat invariant)."""
    ds = _toy_dataset()
    losses = {}
    for remat in (False, True):
        enc = TransformerEncoder(
            name="cp_r_src", vocabulary=_vocab(), data_id="source",
            embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4,
            remat=remat)
        dec = TransformerDecoder(
            name="cp_r_tgt", vocabulary=_vocab(), data_id="target",
            encoders=[enc], embedding_size=16, ff_hidden_size=32,
            depth=2, n_heads_self=4, n_heads_enc=4, max_output_len=6,
            tie_embeddings=False, remat=remat)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        manager = TPUManager(num_context_shards=4, random_seed=0)
        manager.initialize_model_parts([trainer], seed=0)
        losses[remat] = [
            manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
            for _ in range(2)]
        disable_context_parallel()
    assert losses[False][0] == pytest.approx(losses[True][0], rel=1e-5)
    assert losses[False][1] == pytest.approx(losses[True][1], rel=1e-5)


def test_context_parallel_ini_driven(tmp_path, monkeypatch):
    """[tf_manager] num_context_shards flows from the INI through the
    config builder into the mesh, and attention dropout keeps the ring
    engaged (counter-based blockwise masks) — the full product path
    the docs describe (docs/configuration.md)."""
    calls = {"n": 0}
    real = ring_mod.ring_attention

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(ring_mod, "ring_attention", counted)
    from neuralmonkey_tpu.experiment import Experiment
    config = os.path.join(os.path.dirname(__file__), "configs",
                          "transformer.ini")
    exp = Experiment(
        config, train_mode=True,
        config_changes=[f'main.output="{tmp_path}/cp_ini"',
                        "main.logging_period=10", "main.epochs=1",
                        "tf_manager.num_context_shards=2",
                        "encoder.attention_dropout_keep_prob=0.9",
                        "decoder.attention_dropout_keep_prob=0.9"])
    exp.train()
    assert context_parallel_mesh() is not None
    assert calls["n"] > 0


def test_context_mesh_shapes_and_rejections():
    manager = TPUManager(num_context_shards=4)
    assert dict(manager.mesh.shape) == {"data": 2, "context": 4}
    manager = TPUManager(num_context_shards=2, num_model_shards=2)
    assert dict(manager.mesh.shape) == {"data": 2, "context": 2,
                                        "model": 2}
    # CP x PP and CP x EP compose since round 4 (the ring nests inside
    # the GPipe stage body / runs beside the expert all-to-all)
    manager = TPUManager(num_context_shards=2, num_pipeline_stages=2)
    assert dict(manager.mesh.shape) == {"data": 2, "pipe": 2,
                                        "context": 2}
    manager = TPUManager(num_context_shards=2, num_expert_shards=2)
    assert dict(manager.mesh.shape) == {"data": 2, "expert": 2,
                                        "context": 2}
    with pytest.raises(ValueError):  # 3*1 does not divide 8
        TPUManager(num_context_shards=3)


def _toy_dataset_cp6():
    """Source length 6 so the pipelined ENCODER's self-attention is
    ring-eligible at cp=2 as well (6 % 2 == 0)."""
    return Dataset("toy", {
        "source": [[f"w{(i + j) % 24}" for j in range(6)]
                   for i in range(16)],
        "target": [[f"w{i % 24}", f"w{(i + 3) % 24}"]
                   for i in range(16)],
    })


def _build_staged(stages=0, experts=0):
    kwargs = dict(embedding_size=16, ff_hidden_size=32, depth=4,
                  dropout_keep_prob=1.0)
    if stages:
        kwargs["pipeline_stages"] = stages
    if experts:
        kwargs["moe_experts"] = experts
    enc = TransformerEncoder(
        name="cpx_src", vocabulary=_vocab(), data_id="source",
        n_heads=4, **kwargs)
    dec = TransformerDecoder(
        name="cpx_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], n_heads_self=4, n_heads_enc=4,
        max_output_len=6, tie_embeddings=False, **kwargs)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    return trainer, GreedyRunner(output_series="target", decoder=dec)


def test_context_parallel_composes_with_pipeline(monkeypatch):
    """CP x PP (round 4): the ring's partial-auto shard_map nests
    INSIDE the GPipe stage body (only 'context' manual there, over the
    trace context's abstract mesh; the shard index rides an iota
    operand because axis_index fails MLIR verification in nested
    wraps). Train/decode on the dp x pp x cp mesh must match the
    pp-only run exactly, with the ring engaged and the stacked layer
    params still 'pipe'-sharded."""
    calls = {"n": 0}
    real = ring_mod.ring_attention

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(ring_mod, "ring_attention", counted)
    from neuralmonkey_tpu.parallel.pipeline import disable_pipeline
    ds = _toy_dataset_cp6()
    res = {}
    for cp in (1, 2):
        trainer, runner = _build_staged(stages=2)
        manager = TPUManager(num_context_shards=cp,
                             num_pipeline_stages=2, random_seed=0)
        expect = {"data": 4 // cp, "pipe": 2}
        if cp > 1:
            expect["context"] = cp
        assert dict(manager.mesh.shape) == expect
        manager.initialize_model_parts([trainer, runner], seed=0)
        qw = manager.params["cpx_src"]["layers"]["att"]["q"]["w"]
        assert qw.sharding.shard_shape(qw.shape) == (2, 16, 16)
        before = calls["n"]
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        if cp > 1:  # enc self + dec self ride the ring in-stage
            assert calls["n"] > before
        else:
            assert calls["n"] == before
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[cp] = (l1, l2, outs)
        disable_context_parallel()
        disable_pipeline()
    assert res[1][0] == pytest.approx(res[2][0], rel=1e-5)
    assert res[1][1] == pytest.approx(res[2][1], rel=1e-5)
    assert res[1][2] == res[2][2]


def test_context_parallel_composes_with_expert_parallel(monkeypatch):
    """CP x EP (round 4): the ring and the MoE expert all-to-all sit
    at sibling call sites (attention vs FFN) with disjoint manual
    axes on the dp x ep x cp mesh — losses and decodes match the
    single-mesh MoE run exactly."""
    calls = {"n": 0}
    real = ring_mod.ring_attention

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(ring_mod, "ring_attention", counted)
    from neuralmonkey_tpu.ops.moe import disable_expert_sharding
    ds = _toy_dataset_cp6()
    res = {}
    for cp in (1, 2):
        trainer, runner = _build_staged(experts=4)
        manager = TPUManager(num_context_shards=cp,
                             num_expert_shards=2 if cp > 1 else 1,
                             random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        before = calls["n"]
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        if cp > 1:
            assert calls["n"] > before
        else:
            assert calls["n"] == before
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[cp] = (l1, l2, outs)
        disable_context_parallel()
        disable_expert_sharding()
    assert res[1][0] == pytest.approx(res[2][0], rel=1e-5)
    assert res[1][1] == pytest.approx(res[2][1], rel=1e-5)
    assert res[1][2] == res[2][2]
