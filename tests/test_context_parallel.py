"""Ring-attention context parallelism (parallel/ring_attention.py).

The reference framework is single-device with vanilla O(T²) attention
(SURVEY.md §3 parallelism census); context parallelism is a TPU-native
scaling extension over the reserved sequence mesh axis (SURVEY.md §6).
These tests run on the 8-device virtual CPU mesh from conftest.
"""

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
    context_parallel_mesh, disable_context_parallel,
    enable_context_parallel, ring_attention, ring_eligible)
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


def test_context_mesh_shapes_and_rejections():
    manager = TPUManager(num_context_shards=4)
    assert dict(manager.mesh.shape) == {"data": 2, "context": 4}
    manager = TPUManager(num_context_shards=2, num_model_shards=2)
    assert dict(manager.mesh.shape) == {"data": 2, "context": 2,
                                        "model": 2}
    with pytest.raises(ValueError):
        TPUManager(num_context_shards=2, num_pipeline_stages=2)
    with pytest.raises(ValueError):
        TPUManager(num_context_shards=2, num_expert_shards=2)
    with pytest.raises(ValueError):  # 3*1 does not divide 8
        TPUManager(num_context_shards=3)
