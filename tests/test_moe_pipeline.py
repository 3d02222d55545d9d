"""MoE x pipeline parallelism composition (EP x PP, EP x PP x TP).

The reference framework is single-device (nm/tf_manager.py); both
pipeline parallelism and mixture-of-experts are TPU-native scaling
extensions, and their composition stages MoE transformer layers over
'pipe' while each stage's expert weights split over 'expert'. The MoE
routing sums accumulate across microbatches INSIDE the GPipe executor
(gpipe_apply's aux_fn) and fold once, so the balance/z aux losses are
exactly the sequential full-batch values. Runs on the 8-device virtual
CPU mesh from conftest.
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
from neuralmonkey_tpu.ops.moe import disable_expert_sharding
from neuralmonkey_tpu.parallel.pipeline import (disable_pipeline,
                                                gpipe_apply)
from neuralmonkey_tpu.runners.runner import GreedyRunner
from neuralmonkey_tpu.runtime import TPUManager
from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
    CrossEntropyTrainer
from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
from neuralmonkey_tpu.vocabulary import Vocabulary


@pytest.fixture(autouse=True)
def _clean_registries():
    yield
    disable_pipeline()
    disable_expert_sharding()


def _vocab(n=28):
    v = Vocabulary()
    for i in range(n):
        v.add_word(f"w{i}")
    return v


def _toy_dataset():
    return Dataset("toy", {
        "source": [[f"w{i}", f"w{i + 1}", f"w{i + 2}"]
                   for i in range(16)],
        "target": [[f"w{i}", f"w{i + 3}"] for i in range(16)],
    })


def _build(stages, n_experts=4, dropout=1.0, noise=0.0):
    enc = TransformerEncoder(
        name="mp_src", vocabulary=_vocab(), data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4,
        dropout_keep_prob=dropout, moe_experts=n_experts,
        moe_router_noise=noise, pipeline_stages=stages)
    dec = TransformerDecoder(
        name="mp_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=2,
        n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False, dropout_keep_prob=dropout,
        moe_experts=n_experts, moe_router_noise=noise,
        pipeline_stages=stages)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    return trainer, GreedyRunner(output_series="target", decoder=dec)


def test_gpipe_aux_fn_accumulates_exact_full_batch_stats():
    """Executor contract: layer_fn returns (h, stats); stats are
    summed over microbatches per layer (garbage fill/drain ticks
    masked out), folded per layer by aux_fn, and totalled over layers
    — equal to the sequential stack's values."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("data", "pipe"))
    from neuralmonkey_tpu.parallel.pipeline import enable_pipeline
    enable_pipeline(mesh)

    rng = np.random.RandomState(0)
    ws = jnp.asarray(rng.randn(4, 8, 8).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(16, 3, 8).astype(np.float32))

    def layer(w, h):
        out = jnp.tanh(h @ w)
        # stats linear in the tokens; aux_fn folds them nonlinearly,
        # so the result only matches if accumulation happens BEFORE
        # the fold (the whole point of the stats contract)
        return out, {"s": jnp.sum(out), "c": jnp.asarray(
            float(out.shape[0] * out.shape[1]), jnp.float32)}

    def aux_fn(st):
        return {"mean": st["s"] / st["c"]}

    def seq(ws, x):
        total = 0.0
        h = x
        for i in range(4):
            h, st = layer(ws[i], h)
            total = total + aux_fn(st)["mean"]
        return h, total

    def pipe(ws, x):
        return gpipe_apply(
            lambda lp, la, h, aux: layer(lp, h),
            ws, None, x, {}, n_microbatches=4, aux_fn=aux_fn)

    ref_h, ref_t = seq(ws, x)
    got_h, got = jax.jit(pipe)(ws, x)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got["mean"]), float(ref_t),
                               rtol=1e-5)
    # grads flow through the aux channel into the layer weights
    g = jax.jit(jax.grad(lambda w, x: pipe(w, x)[1]["mean"]))(ws, x)
    g_ref = jax.grad(lambda w, x: seq(w, x)[1])(ws, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_moe_pipeline_matches_sequential():
    """EP x PP product path on a (data=2, pipe=2, expert=2) mesh:
    losses (incl. the exact balance aux), trajectories and decode
    outputs match the replicated non-pipelined run."""
    ds = _toy_dataset()
    res = {}
    for stages in (0, 2):
        trainer, runner = _build(stages)
        manager = TPUManager(
            num_pipeline_stages=stages if stages else 1,
            num_expert_shards=2 if stages else 1, random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if stages:
            assert dict(manager.mesh.shape) == {
                "data": 2, "pipe": 2, "expert": 2}
            w = manager.params["mp_src"]["layers"]["ff"]["in"]["w"]
            assert w.shape == (2, 4, 16, 32)
            # one layer per stage, half the experts per device
            assert w.sharding.shard_shape(w.shape) == (1, 2, 16, 32)
            r = manager.params["mp_src"]["layers"]["ff"]["router"]["w"]
            assert r.sharding.shard_shape(r.shape)[0] == 1
        m1 = manager.train_on_batch(trainer, ds, batch_size=16)
        m2 = manager.train_on_batch(trainer, ds, batch_size=16)
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[stages] = (m1, m2, outs)
        disable_pipeline()
        disable_expert_sharding()
    for key in ("loss", "aux/mp_src/moe_balance",
                "aux/mp_tgt/moe_balance"):
        assert res[0][0][key] == pytest.approx(res[2][0][key],
                                               rel=1e-5), key
        assert res[0][1][key] == pytest.approx(res[2][1][key],
                                               rel=1e-5), key
    assert res[0][2] == res[2][2]


def test_moe_pipeline_tensor_parallel_mesh():
    """EP x PP x TP on a (data=1, pipe=2, expert=2, model=2) mesh:
    expert hidden dims Megatron-shard inside each stage's expert
    group; results still match the replicated run."""
    ds = _toy_dataset()
    res = {}
    for parallel in (False, True):
        trainer, runner = _build(2 if parallel else 0)
        manager = TPUManager(
            num_pipeline_stages=2 if parallel else 1,
            num_expert_shards=2 if parallel else 1,
            num_model_shards=2 if parallel else 1, random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if parallel:
            assert dict(manager.mesh.shape) == {
                "data": 1, "pipe": 2, "expert": 2, "model": 2}
            w = manager.params["mp_src"]["layers"]["ff"]["in"]["w"]
            # ('pipe', 'expert', None, 'model') on (2, 4, 16, 32)
            assert w.sharding.shard_shape(w.shape) == (1, 2, 16, 16)
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[parallel] = (l1, outs)
        disable_pipeline()
        disable_expert_sharding()
    assert res[False][0] == pytest.approx(res[True][0], rel=1e-5)
    assert res[False][1] == res[True][1]


def test_moe_pipeline_with_dropout_and_noise_trains():
    """Dropout + router noise under the pipeline (per-layer keys
    folded with the microbatch ordinal, including the moe_noise
    site): loss finite and decreasing."""
    ds = _toy_dataset()
    trainer, runner = _build(2, dropout=0.9, noise=0.2)
    manager = TPUManager(num_pipeline_stages=2, num_expert_shards=2,
                         random_seed=0)
    manager.initialize_model_parts([trainer, runner], seed=0)
    losses = [manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
              for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    outs = manager.run_on_batch([runner], ds, batch_size=16)[0].outputs
    assert len(outs) == 16


def test_moe_pipelined_config_falls_back_without_mesh():
    """A pipelined MoE config opened WITHOUT a pipeline mesh runs the
    stacked layout sequentially and matches the per-layer layout."""
    ds = _toy_dataset()
    trainer, _ = _build(2)
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts([trainer], seed=0)
    m = manager.train_on_batch(trainer, ds, batch_size=16)
    trainer2, _ = _build(0)
    manager2 = TPUManager(random_seed=0)
    manager2.initialize_model_parts([trainer2], seed=0)
    m2 = manager2.train_on_batch(trainer2, ds, batch_size=16)
    assert m["loss"] == pytest.approx(m2["loss"], rel=1e-5)
    assert m["aux/mp_tgt/moe_balance"] == pytest.approx(
        m2["aux/mp_tgt/moe_balance"], rel=1e-5)
