"""Mixture-of-experts FFN + expert parallelism (ops/moe.py).

The reference framework has only the dense position-wise FFN
(nm/encoders/transformer.py); MoE is a TPU-native scaling extension.
Runs on the 8-device virtual CPU mesh from conftest.
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
from neuralmonkey_tpu.ops.attention import ffn
from neuralmonkey_tpu.ops.moe import (disable_expert_sharding,
                                      moe_capacity, moe_ffn, moe_init)
from neuralmonkey_tpu.runners.runner import GreedyRunner
from neuralmonkey_tpu.runtime import TPUManager
from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
    CrossEntropyTrainer
from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
from neuralmonkey_tpu.vocabulary import Vocabulary


@pytest.fixture(autouse=True)
def _clean_expert_registry():
    yield
    disable_expert_sharding()


def test_moe_single_expert_matches_dense():
    """E=1: the router is a no-op (softmax over one expert = 1) and
    the MoE output equals the dense FFN with the same weights."""
    params = moe_init(jax.random.PRNGKey(0), 8, 16, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 8))
    y, _ = moe_ffn(params, x, top_k=1, capacity_factor=8.0)
    dense = {"in": {"w": params["in"]["w"][0],
                    "b": params["in"]["b"][0]},
             "out": {"w": params["out"]["w"][0],
                     "b": params["out"]["b"][0]}}
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(ffn(dense, x)),
                               rtol=1e-5, atol=1e-6)


def test_moe_topk_matches_per_expert_reference():
    """With ample capacity, each token's output is the gate-weighted
    sum of its top-k experts' dense FFNs (brute-force reference)."""
    n_experts, k = 4, 2
    params = moe_init(jax.random.PRNGKey(2), 8, 16, n_experts)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 8))
    y, _ = moe_ffn(params, x, top_k=k, capacity_factor=float(n_experts))

    probs = jax.nn.softmax(
        jnp.einsum("gsd,de->gse", x, params["router"]["w"]), -1)
    gate_vals, gate_idx = jax.lax.top_k(probs, k)
    gate_vals = gate_vals / gate_vals.sum(-1, keepdims=True)
    per_expert = jnp.stack([
        ffn({"in": {"w": params["in"]["w"][e],
                    "b": params["in"]["b"][e]},
             "out": {"w": params["out"]["w"][e],
                     "b": params["out"]["b"][e]}}, x)
        for e in range(n_experts)])                    # (E, G, S, D)
    ref = jnp.zeros_like(x)
    for slot in range(k):
        sel = jnp.take_along_axis(
            per_expert.transpose(1, 2, 0, 3),          # (G, S, E, D)
            gate_idx[:, :, slot][..., None, None], axis=2)[:, :, 0]
        ref = ref + gate_vals[:, :, slot][..., None] * sel
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_moe_capacity_overflow_drops_tokens():
    """A router biased so every token picks expert 0: only the first C
    tokens per group get served, the rest output exactly zero."""
    params = moe_init(jax.random.PRNGKey(4), 8, 16, 4)
    # force expert 0 for every token
    params["router"]["w"] = jnp.zeros_like(
        params["router"]["w"]).at[:, 0].set(100.0)
    # positive inputs so the rigged router (logit_0 = 100 * sum(x))
    # really picks expert 0 for every token
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8))
                ) + 0.1
    y, _ = moe_ffn(params, x, top_k=1, capacity_factor=0.5)
    cap = moe_capacity(8, 4, 1, 0.5)  # = 1
    assert cap == 1
    dense0 = {"in": {"w": params["in"]["w"][0],
                     "b": params["in"]["b"][0]},
              "out": {"w": params["out"]["w"][0],
                      "b": params["out"]["b"][0]}}
    np.testing.assert_allclose(np.asarray(y[0, 0]),
                               np.asarray(ffn(dense0, x[0, :1])[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(y[0, 1:]), 0.0)


def test_moe_mask_excludes_padding():
    """Masked tokens are not dispatched (zero output) and don't eat
    capacity from real tokens."""
    params = moe_init(jax.random.PRNGKey(6), 8, 16, 2)
    params["router"]["w"] = jnp.zeros_like(
        params["router"]["w"]).at[:, 0].set(100.0)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (1, 6, 8))
                ) + 0.1
    mask = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0, 0.0]])
    # capacity 2 on expert 0; without the mask tokens 0-1 would claim it
    y, _ = moe_ffn(params, x, mask=mask, top_k=1,
                   capacity_factor=2.0 / 3.0)
    assert moe_capacity(6, 2, 1, 2.0 / 3.0) == 2
    np.testing.assert_array_equal(np.asarray(y[0, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(y[0, 4]), 0.0)
    dense0 = {"in": {"w": params["in"]["w"][0],
                     "b": params["in"]["b"][0]},
              "out": {"w": params["out"]["w"][0],
                      "b": params["out"]["b"][0]}}
    np.testing.assert_allclose(
        np.asarray(y[0, 2:4]),
        np.asarray(ffn(dense0, x[0, 2:4])),
        rtol=1e-5, atol=1e-6)


def test_moe_balance_loss():
    """Uniform routing scores exactly 1; a fully-collapsed router
    scores E (the loss the aux term pushes against)."""
    n_experts = 4
    params = moe_init(jax.random.PRNGKey(8), 8, 16, n_experts)
    params["router"]["w"] = jnp.zeros_like(params["router"]["w"])
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (2, 16, 8))
                ) + 0.1
    _, aux = moe_ffn(params, x, top_k=1, capacity_factor=2.0)
    # uniform probs: top_k breaks ties by index (all tokens land on
    # expert 0) -> load=(1,0,0,0), prob_mean=1/E each -> E*1*(1/E)=1
    assert float(aux["balance"]) == pytest.approx(1.0, rel=1e-5)
    # zero router: logits all 0 -> logsumexp = log(E) -> z = log(E)^2
    assert float(aux["z"]) == pytest.approx(
        float(np.log(n_experts)) ** 2, rel=1e-5)
    params["router"]["w"] = params["router"]["w"].at[:, 2].set(100.0)
    _, collapsed = moe_ffn(params, x, top_k=1, capacity_factor=2.0)
    assert float(collapsed["balance"]) == pytest.approx(n_experts,
                                                        rel=1e-4)
    # huge logits -> huge z penalty (what the z-loss guards against)
    assert float(collapsed["z"]) > 100.0


def test_moe_gradients_reach_router_and_experts():
    params = moe_init(jax.random.PRNGKey(10), 8, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 6, 8))

    def loss(p):
        y, aux = moe_ffn(p, x, top_k=2, capacity_factor=2.0)
        return (jnp.sum(y ** 2) + 0.01 * aux["balance"]
                + 0.001 * aux["z"])

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["router"]["w"]).sum()) > 0.0
    assert float(jnp.abs(grads["in"]["w"]).sum()) > 0.0
    assert float(jnp.abs(grads["out"]["w"]).sum()) > 0.0


# --------------------------------------------------------------------- #
# product integration
# --------------------------------------------------------------------- #
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


def _build_moe(n_experts=4):
    enc = TransformerEncoder(
        name="moe_src", vocabulary=_vocab(), data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4,
        moe_experts=n_experts)
    dec = TransformerDecoder(
        name="moe_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=2,
        n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False, moe_experts=n_experts)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    return trainer, GreedyRunner(output_series="target", decoder=dec)


def test_moe_transformer_trains_and_decodes():
    """An MoE transformer trains (loss decreases, balance terms in the
    loss dict stay near 1) and greedy-decodes."""
    ds = _toy_dataset()
    trainer, runner = _build_moe()
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts([trainer, runner], seed=0)
    losses = [manager.train_on_batch(trainer, ds, batch_size=16)
              for _ in range(8)]
    assert losses[-1]["loss"] < losses[0]["loss"]
    aux_keys = [k for k in losses[0] if k.startswith("aux/")]
    assert sorted(aux_keys) == ["aux/moe_src/moe_balance",
                                "aux/moe_tgt/moe_balance"]
    for k in aux_keys:
        # weighted by moe_aux_weight=0.01; raw balance sits in [1, E]
        assert 0.005 < losses[0][k] < 0.05
    outs = manager.run_on_batch([runner], ds, batch_size=16)[0].outputs
    assert len(outs) == 16


def test_moe_expert_parallel_matches_replicated():
    """Expert parallelism is layout-only: a (data=2, expert=4) mesh
    with expert weights sharded over 'expert' trains and decodes
    identically to the fully-replicated default mesh."""
    ds = _toy_dataset()
    res = {}
    for shards in (1, 4):
        trainer, runner = _build_moe()
        manager = TPUManager(num_expert_shards=shards, random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if shards > 1:
            w = manager.params["moe_src"]["layer_0"]["ff"]["in"]["w"]
            assert w.shape == (4, 16, 32)
            assert w.sharding.shard_shape(w.shape) == (1, 16, 32)
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[shards] = (l1, l2, outs)
        disable_expert_sharding()
    assert res[1][0] == pytest.approx(res[4][0], rel=1e-5)
    assert res[1][1] == pytest.approx(res[4][1], rel=1e-5)
    assert res[1][2] == res[4][2]


def test_rejected_mesh_combinations_still_raise():
    """MoE x pipeline composes since round 3 (test_moe_pipeline.py)
    and MoE x context-parallel since round 4
    (test_context_parallel.py); the one combination the runtime still
    genuinely rejects raises with an actionable message (runtime.py
    guard, docs/distributed.md non-goal). When this cell gets
    implemented, move it to its own composition test."""
    with pytest.raises(ValueError, match="fsdp"):
        TPUManager(fsdp=True, num_pipeline_stages=2)


def test_moe_expert_parallel_composes_with_tensor_parallelism():
    """EP x TP on a (data=2, expert=2, model=2) mesh: experts shard
    over 'expert', each expert's hidden dim Megatron-shards over
    'model' (and the attention/embedding TP specs apply as usual).
    Pure GSPMD — results match the replicated run exactly."""
    ds = _toy_dataset()
    res = {}
    for parallel in (False, True):
        trainer, runner = _build_moe()
        manager = TPUManager(
            num_expert_shards=2 if parallel else 1,
            num_model_shards=2 if parallel else 1, random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if parallel:
            assert dict(manager.mesh.shape) == {
                "data": 2, "expert": 2, "model": 2}
            w = manager.params["moe_src"]["layer_0"]["ff"]["in"]["w"]
            # (4 experts, 16, 32): 2 experts per group, hidden halved
            assert w.sharding.shard_shape(w.shape) == (2, 16, 16)
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[parallel] = (l1, outs)
        disable_expert_sharding()
    assert res[False][0] == pytest.approx(res[True][0], rel=1e-5)
    assert res[False][1] == res[True][1]


def test_moe_beam_search_decodes():
    """The decode contract composes: an MoE decoder beam-searches
    (both lineage and physical paths route tokens through the
    experts) and beam-1 equals greedy."""
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.runners.beam_search_runner import \
        BeamSearchRunner
    ds = _toy_dataset()
    trainer, greedy = _build_moe()
    dec = trainer.objectives[0].decoder
    bs = BeamSearchDecoder(name="moe_bs", parent_decoder=dec,
                           beam_size=4)
    beam_runner = BeamSearchRunner(output_series="target", decoder=bs)
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts(
        [trainer, greedy, beam_runner], seed=0)
    for _ in range(3):
        manager.train_on_batch(trainer, ds, batch_size=16)
    beam_out = manager.run_on_batch([beam_runner], ds,
                                    batch_size=16)[0].outputs
    assert len(beam_out) == 16
    assert all(isinstance(s, list) for s in beam_out)


def test_moe_composes_with_remat():
    """remat=True wraps MoE layers in jax.checkpoint (tuple-returning
    layer fns); losses must match the non-remat run exactly at f32
    tolerance (same ops, same rng sites)."""
    ds = _toy_dataset()
    res = {}
    for remat in (False, True):
        enc = TransformerEncoder(
            name="mr_src", vocabulary=_vocab(), data_id="source",
            embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4,
            moe_experts=4, remat=remat)
        dec = TransformerDecoder(
            name="mr_tgt", vocabulary=_vocab(), data_id="target",
            encoders=[enc], embedding_size=16, ff_hidden_size=32,
            depth=2, n_heads_self=4, n_heads_enc=4, max_output_len=6,
            tie_embeddings=False, moe_experts=4, remat=remat)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        manager = TPUManager(random_seed=0)
        manager.initialize_model_parts([trainer], seed=0)
        res[remat] = [
            manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
            for _ in range(2)]
    assert res[False][0] == pytest.approx(res[True][0], rel=1e-5)
    assert res[False][1] == pytest.approx(res[True][1], rel=1e-5)


def test_moe_router_noise_and_z_loss_train():
    """Router jitter + z-loss knobs: jitter perturbs routing only when
    an rng is passed (training); the z aux term appears in the loss
    dict; eval decode stays deterministic."""
    params = moe_init(jax.random.PRNGKey(12), 8, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 6, 8))
    y0, _ = moe_ffn(params, x, top_k=1, capacity_factor=2.0,
                    router_noise=0.5)  # no rng -> no noise
    y1, _ = moe_ffn(params, x, top_k=1, capacity_factor=2.0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    yn, _ = moe_ffn(params, x, top_k=1, capacity_factor=2.0,
                    router_noise=0.5,
                    noise_rng=jax.random.PRNGKey(14))
    assert float(jnp.abs(yn - y1).max()) > 0.0

    ds = _toy_dataset()
    enc = TransformerEncoder(
        name="zn_src", vocabulary=_vocab(), data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4,
        moe_experts=4, moe_router_noise=0.01,
        moe_z_loss_weight=1e-3)
    dec = TransformerDecoder(
        name="zn_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=2,
        n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False, moe_experts=4, moe_router_noise=0.01,
        moe_z_loss_weight=1e-3)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    runner = GreedyRunner(output_series="target", decoder=dec)
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts([trainer, runner], seed=0)
    losses = [manager.train_on_batch(trainer, ds, batch_size=16)
              for _ in range(5)]
    assert losses[-1]["loss"] < losses[0]["loss"]
    for part in ("zn_src", "zn_tgt"):
        assert f"aux/{part}/moe_balance" in losses[0]
        assert f"aux/{part}/moe_z" in losses[0]
        assert losses[0][f"aux/{part}/moe_z"] > 0.0
    # eval decode is noise-free and deterministic
    o1 = manager.run_on_batch([runner], ds, batch_size=16)[0].outputs
    o2 = manager.run_on_batch([runner], ds, batch_size=16)[0].outputs
    assert o1 == o2


def test_moe_decode_ignores_batch_padding_rows():
    """Decode outputs are batch-composition-invariant: the decode FFN
    routes with NO token dropping (capacity = group size) and masks
    batch-pad rows out of routing, so the same 9 sentences decode
    identically whether the batch carries 7 batch-pad rows
    (batch_size=16) or none (batch_size=9) — greedy AND beam. With the
    train-time capacity factor this failed: pad rows claimed expert
    slots and changed real sentences' outputs."""
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.runners.beam_search_runner import \
        BeamSearchRunner
    trainer, runner = _build_moe()
    dec = trainer.objectives[0].decoder
    bs = BeamSearchDecoder(name="pad_bs", parent_decoder=dec,
                           beam_size=4)
    beam_runner = BeamSearchRunner(output_series="target", decoder=bs)
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts(
        [trainer, runner, beam_runner], seed=0)
    for _ in range(3):
        manager.train_on_batch(trainer, _toy_dataset(), batch_size=16)
    ds9 = Dataset("toy9", {
        "source": [[f"w{i}", f"w{i + 1}", f"w{i + 2}"]
                   for i in range(9)],
        "target": [[f"w{i}", f"w{i + 3}"] for i in range(9)],
    })
    for r in (runner, beam_runner):
        padded = manager.run_on_batch([r], ds9,
                                      batch_size=16)[0].outputs
        exact = manager.run_on_batch([r], ds9,
                                     batch_size=9)[0].outputs
        assert padded == exact


def test_constrain_dispatch_shards_group_axis():
    """Expert-major intermediates shard their group (batch) axis over
    'data' in addition to 'expert' — with the group axis pinned
    replicated, every data shard would redundantly run the expert FFN
    on the full global batch. Decode-shaped tensors (G=1) replicate
    the group axis legitimately."""
    from neuralmonkey_tpu.ops.moe import (constrain_dispatch,
                                          enable_expert_sharding)
    P = jax.sharding.PartitionSpec
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()).reshape(2, 4), ("data", "expert"))
    enable_expert_sharding(mesh)
    try:
        out = jax.jit(constrain_dispatch)(jnp.zeros((8, 8, 4, 16)))
        assert out.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(
                mesh, P("expert", "data", None, None)), 4)
        out1 = jax.jit(constrain_dispatch)(jnp.zeros((8, 1, 4, 16)))
        assert out1.sharding.is_equivalent_to(
            jax.sharding.NamedSharding(
                mesh, P("expert", None, None, None)), 4)
    finally:
        disable_expert_sharding()


def test_new_manager_clears_stale_parallelism_registries():
    """A TPUManager built after a pipeline/expert/sequence-parallel
    one in the same process must not leave the constraint helpers
    pointing at the old mesh (shard_map over a stale mesh errors or
    misplaces work)."""
    from neuralmonkey_tpu.ops.moe import expert_sharding_mesh
    from neuralmonkey_tpu.ops.sharding import sequence_sharding_mesh
    from neuralmonkey_tpu.parallel.pipeline import pipeline_mesh
    TPUManager(num_pipeline_stages=2)
    assert pipeline_mesh() is not None
    TPUManager(num_expert_shards=2)
    assert pipeline_mesh() is None
    assert expert_sharding_mesh() is not None
    TPUManager(num_model_shards=2, sequence_sharding=True)
    assert expert_sharding_mesh() is None
    assert sequence_sharding_mesh() is not None
    TPUManager()
    assert sequence_sharding_mesh() is None
