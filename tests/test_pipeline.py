"""GPipe pipeline parallelism (parallel/pipeline.py).

The reference framework is single-device (SURVEY.md §3 parallelism
census); pipeline parallelism is a TPU-native scaling extension. These
tests run on the 8-device virtual CPU mesh from conftest.
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
from neuralmonkey_tpu.parallel.pipeline import (disable_pipeline,
                                                enable_pipeline,
                                                gpipe_apply,
                                                pipeline_mesh)
from neuralmonkey_tpu.runners.runner import GreedyRunner
from neuralmonkey_tpu.runtime import TPUManager
from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
    CrossEntropyTrainer
from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
from neuralmonkey_tpu.vocabulary import Vocabulary


@pytest.fixture(autouse=True)
def _clean_pipeline_registry():
    yield
    disable_pipeline()


def test_gpipe_executor_matches_sequential():
    """The raw executor: forward exact, gradients (weights, input,
    and pipe-replicated aux) equal to the sequential stack."""
    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("data", "pipe"))
    enable_pipeline(mesh)
    n_layers, batch, time, dim = 8, 16, 6, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    ws = jax.random.normal(ks[0], (n_layers, dim, dim)) * 0.3
    bs = jax.random.normal(ks[1], (n_layers, dim)) * 0.1
    x = jax.random.normal(ks[2], (batch, time, dim))
    mask = (jax.random.uniform(ks[3], (batch, time)) > 0.2
            ).astype(jnp.float32)
    enc = jax.random.normal(ks[4], (batch, time, dim))

    def layer(w, b, h, mask_a, enc_a):
        return jnp.tanh(h @ w + b) * mask_a[..., None] + 0.1 * enc_a

    def seq(ws, bs, x, enc):
        h = x
        for i in range(n_layers):
            h = layer(ws[i], bs[i], h, mask, enc)
        return h

    def pipe(ws, bs, x, enc):
        def layer_fn(lp, la, h, aux):
            return (jnp.tanh(h @ lp["w"] + lp["b"])
                    * aux["mask"][..., None] + 0.1 * aux["enc"])
        return gpipe_apply(layer_fn, {"w": ws, "b": bs}, None, x,
                           {"mask": mask, "enc": enc},
                           n_microbatches=4)

    np.testing.assert_allclose(np.asarray(jax.jit(pipe)(ws, bs, x, enc)),
                               np.asarray(seq(ws, bs, x, enc)),
                               rtol=1e-6, atol=1e-6)
    g_ref = jax.grad(lambda *a: jnp.sum(seq(*a) ** 2),
                     argnums=(0, 1, 2, 3))(ws, bs, x, enc)
    g_got = jax.jit(jax.grad(lambda *a: jnp.sum(pipe(*a) ** 2),
                             argnums=(0, 1, 2, 3)))(ws, bs, x, enc)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


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


def _build(stages, dropout=1.0):
    enc = TransformerEncoder(
        name="pp_src", vocabulary=_vocab(), data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=4, n_heads=4,
        dropout_keep_prob=dropout, pipeline_stages=stages)
    dec = TransformerDecoder(
        name="pp_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=4,
        n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False, dropout_keep_prob=dropout,
        pipeline_stages=stages)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    return trainer, GreedyRunner(output_series="target", decoder=dec)


def test_pipelined_transformer_matches_sequential():
    """Full product path: a 4-stage pipelined encoder (dp=2 x pp=4
    mesh, stacked layer params sharded over 'pipe') trains and decodes
    identically to the sequential single-mesh run. Two train steps so
    gradient flow through the pipeline is covered."""
    ds = _toy_dataset()
    res = {}
    for stages in (0, 4):
        trainer, runner = _build(stages)
        manager = TPUManager(
            num_pipeline_stages=stages if stages else 1, random_seed=0)
        assert (pipeline_mesh() is not None) == bool(stages)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if stages:
            qw = manager.params["pp_src"]["layers"]["att"]["q"]["w"]
            assert qw.shape == (4, 16, 16)
            # one layer per stage resident per device
            assert qw.sharding.shard_shape(qw.shape) == (1, 16, 16)
            xw = (manager.params["pp_tgt"]["layers"]["cross_att_0"]
                  ["v"]["w"])
            assert xw.sharding.shard_shape(xw.shape) == (1, 16, 16)
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[stages] = (l1, l2, outs)
        disable_pipeline()
    assert res[0][0] == pytest.approx(res[4][0], rel=1e-5)
    assert res[0][1] == pytest.approx(res[4][1], rel=1e-5)
    assert res[0][2] == res[4][2]


def test_pipelined_transformer_with_dropout_trains():
    """Dropout under the pipeline (per-layer keys folded with the
    microbatch ordinal): loss finite and decreasing over a few steps.
    Numerics differ from the sequential path by design (different rng
    sites), so this asserts training works, not equivalence."""
    ds = _toy_dataset()
    trainer, runner = _build(4, dropout=0.9)
    manager = TPUManager(num_pipeline_stages=4, random_seed=0)
    manager.initialize_model_parts([trainer, runner], seed=0)
    losses = [manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
              for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    outs = manager.run_on_batch([runner], ds, batch_size=16)[0].outputs
    assert len(outs) == 16


def test_pipelined_config_falls_back_without_mesh():
    """A pipelined part opened WITHOUT a pipeline mesh (single-data
    mesh) must run the stacked layout sequentially and still train."""
    ds = _toy_dataset()
    trainer, runner = _build(4)
    manager = TPUManager(random_seed=0)  # ('data',) mesh, no 'pipe'
    assert pipeline_mesh() is None
    manager.initialize_model_parts([trainer, runner], seed=0)
    loss = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
    assert np.isfinite(loss)
    # and matches the sequential non-pipelined model exactly (same
    # init values, same math, just a stacked param layout)
    trainer2, _ = _build(0)
    manager2 = TPUManager(random_seed=0)
    manager2.initialize_model_parts([trainer2], seed=0)
    loss2 = manager2.train_on_batch(trainer2, ds, batch_size=16)["loss"]
    assert loss == pytest.approx(loss2, rel=1e-5)


def test_pipeline_model_shards_combination_builds_3d_mesh():
    """PP + TP is supported (partial-auto shard_map): the manager
    builds a ('data', 'pipe', 'model') mesh."""
    manager = TPUManager(num_pipeline_stages=4, num_model_shards=2)
    assert dict(manager.mesh.shape) == {"data": 1, "pipe": 4,
                                        "model": 2}
    with pytest.raises(ValueError):  # 4*3 does not divide 8 devices
        TPUManager(num_pipeline_stages=4, num_model_shards=3)


def test_pipeline_rejects_indivisible_depth():
    with pytest.raises(ValueError):
        TransformerEncoder(
            name="bad", vocabulary=_vocab(), data_id="source",
            embedding_size=16, depth=5, n_heads=4, pipeline_stages=4)


def test_pipelined_more_microbatches_than_stages():
    """pipeline_microbatches=M > S shrinks the GPipe bubble; the math
    must stay exactly the sequential stack's."""
    ds = _toy_dataset()
    res = {}
    for stages, micro in ((0, 0), (4, 8)):
        enc = TransformerEncoder(
            name="pm_src", vocabulary=_vocab(), data_id="source",
            embedding_size=16, ff_hidden_size=32, depth=4, n_heads=4,
            dropout_keep_prob=1.0, pipeline_stages=stages,
            pipeline_microbatches=micro)
        dec = TransformerDecoder(
            name="pm_tgt", vocabulary=_vocab(), data_id="target",
            encoders=[enc], embedding_size=16, ff_hidden_size=32,
            depth=4, n_heads_self=4, n_heads_enc=4, max_output_len=6,
            tie_embeddings=False, dropout_keep_prob=1.0,
            pipeline_stages=stages, pipeline_microbatches=micro)
        trainer = CrossEntropyTrainer(
            decoders=[dec], clip_norm=1.0,
            optimizer=AdamOptimizer(learning_rate=1e-3))
        manager = TPUManager(
            num_pipeline_stages=stages if stages else 1, random_seed=0)
        manager.initialize_model_parts([trainer], seed=0)
        loss = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        res[stages] = loss
        disable_pipeline()
    assert res[0] == pytest.approx(res[4], rel=1e-5)


def test_pipeline_rejects_fewer_microbatches_than_stages():
    with pytest.raises(ValueError):
        TransformerEncoder(
            name="bad_m", vocabulary=_vocab(), data_id="source",
            embedding_size=16, depth=4, n_heads=4,
            pipeline_stages=4, pipeline_microbatches=2)


def test_pipeline_composes_with_tensor_parallelism():
    """PP x TP on a (data=2, pipe=2, model=2) mesh: the pipeline's
    shard_map keeps only 'pipe' manual, so the Megatron 'model'
    shardings of each stage's layer weights stay GSPMD-managed inside
    the stage body. Losses and decodes must match the fully-replicated
    sequential run."""
    ds = _toy_dataset()
    res = {}
    for parallel in (False, True):
        trainer, runner = _build(2 if parallel else 0)
        manager = TPUManager(
            num_pipeline_stages=2 if parallel else 1,
            num_model_shards=2 if parallel else 1, random_seed=0)
        manager.initialize_model_parts([trainer, runner], seed=0)
        if parallel:
            assert dict(manager.mesh.shape) == {
                "data": 2, "pipe": 2, "model": 2}
            qw = manager.params["pp_src"]["layers"]["att"]["q"]["w"]
            # (4 layers, 16, 16) -> 2 layers per stage, cols over TP
            assert qw.sharding.shard_shape(qw.shape) == (2, 16, 8)
        l1 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        l2 = manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        res[parallel] = (l1, l2, outs)
        disable_pipeline()
    assert res[False][0] == pytest.approx(res[True][0], rel=1e-5)
    assert res[False][1] == pytest.approx(res[True][1], rel=1e-5)
    assert res[False][2] == res[True][2]


def _stacked_moment_leaves(manager, needle):
    """All >=2-dim optimizer-state leaves whose path contains
    ``needle`` (e.g. the stacked q projection of the encoder)."""
    state = next(iter(manager._opt_states.values()))
    found = []

    def visit(path, leaf):
        names = "/".join(
            str(getattr(e, "key",
                        getattr(e, "name", getattr(e, "idx", ""))))
            for e in path)
        if needle in names and getattr(leaf, "ndim", 0) == 3:
            found.append(leaf)

    jax.tree_util.tree_map_with_path(visit, state)
    return found


def test_pipeline_composes_with_zero1_moment_sharding():
    """The optimizer-memory half of VERDICT r2 item 5 that IS
    compatible with the pipeline's shard_map layout: ZeRO-1 moments
    of the stacked layer params keep their leading 'pipe' axis AND
    shard a free dim over 'data', while the trajectory matches the
    unsharded pipelined run. (fsdp=True stays rejected: an extra
    'data' sharding on the PARAMS would contradict the pipeline's
    P('pipe', ...) in_specs.)"""
    ds = _toy_dataset()
    res = {}
    for zero1 in (False, True):
        trainer, runner = _build(4)
        manager = TPUManager(num_pipeline_stages=4, random_seed=0,
                             shard_optimizer_state=zero1)
        manager.initialize_model_parts([trainer, runner], seed=0)
        losses = [
            manager.train_on_batch(trainer, ds, batch_size=16)["loss"]
            for _ in range(2)]
        outs = manager.run_on_batch([runner], ds,
                                    batch_size=16)[0].outputs
        if zero1:
            moments = _stacked_moment_leaves(manager,
                                             "pp_src/layers/att/q/w")
            assert moments, "no stacked moments found"
            for leaf in moments:  # Adam mu + nu
                assert leaf.shape == (4, 16, 16)
                # 'pipe' keeps the layer axis; 'data' (=2) shards the
                # largest free dim
                assert leaf.sharding.shard_shape(leaf.shape) == \
                    (1, 8, 16), leaf.sharding
        res[zero1] = (losses, outs)
        disable_pipeline()
    assert res[False][0][0] == pytest.approx(res[True][0][0], rel=1e-5)
    assert res[False][0][1] == pytest.approx(res[True][0][1], rel=1e-5)
    assert res[False][1] == res[True][1]


def _pipelined_train_temp_bytes(remat):
    """Per-device temp (activation) bytes of the compiled pipelined
    train step, via XLA's memory analysis."""
    ds = _toy_dataset()
    enc = TransformerEncoder(
        name="pm_src", vocabulary=_vocab(), data_id="source",
        embedding_size=32, ff_hidden_size=256, depth=8, n_heads=4,
        pipeline_stages=4, remat=remat)
    dec = TransformerDecoder(
        name="pm_tgt", vocabulary=_vocab(), data_id="target",
        encoders=[enc], embedding_size=32, ff_hidden_size=256,
        depth=8, n_heads_self=4, n_heads_enc=4, max_output_len=6,
        tie_embeddings=False, pipeline_stages=4, remat=remat)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    manager = TPUManager(num_pipeline_stages=4, random_seed=0)
    manager.initialize_model_parts([trainer], seed=0)
    batch, _ = manager.build_batch(ds, 16, train=True)
    step_fn, key = manager._get_train_fn(trainer)
    compiled = step_fn.lower(
        manager.params_list[0], manager._opt_states[key], batch,
        manager._rng, jnp.asarray(0, jnp.int32)).compile()
    disable_pipeline()
    return compiled.memory_analysis().temp_size_in_bytes


def test_pipeline_remat_bounds_activation_memory():
    """GPipe stores every (tick, stage) activation for autodiff;
    remat=True checkpoints each layer body so only the per-tick stage
    INPUTS survive to the backward — the pipeline's activation-memory
    lever (VERDICT r2 item 5; measured ratio documented in
    docs/distributed.md). True 1F1B scheduling cannot shrink this
    further while the loss sits outside the pipelined stack: JAX
    computes the full forward before any backward, so liveness is set
    by what the forward SAVES, not by tick order — see the
    parallel/pipeline.py docstring."""
    plain = _pipelined_train_temp_bytes(False)
    remat = _pipelined_train_temp_bytes(True)
    # the reduction must be structural (layer internals dropped), not
    # fusion noise
    assert remat < 0.75 * plain, (remat, plain)
