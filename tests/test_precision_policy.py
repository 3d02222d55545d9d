"""bf16 compute-precision policy (ops/policy.py): master params stay
f32, matrix params cast at use time, losses/selection stay f32, and
training under the policy matches f32 closely on a toy task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.ops import policy


@pytest.fixture(autouse=True)
def _reset_policy():
    yield
    policy.set_compute_dtype(None)


def test_cast_rules():
    policy.set_compute_dtype("bfloat16")
    tree = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,)),
            "ids": jnp.zeros((4, 4), jnp.int32)}
    cast = policy.cast_params_for_compute(tree)
    assert cast["w"].dtype == jnp.bfloat16      # matrices cast
    assert cast["b"].dtype == jnp.float32       # vectors stay
    assert cast["ids"].dtype == jnp.int32       # non-float stays
    policy.set_compute_dtype(None)
    same = policy.cast_params_for_compute(tree)
    assert same["w"].dtype == jnp.float32


def test_invalid_dtype_rejected():
    with pytest.raises(ValueError):
        policy.set_compute_dtype("float16")


def _toy():
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.models.attention.feed_forward import Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vs, vt = Vocabulary(), Vocabulary()
    rng = np.random.RandomState(0)
    src = [[f"s{i}" for i in rng.randint(0, 12, size=4)]
           for _ in range(8)]
    tgt = [[f"t{i}" for i in rng.randint(0, 12, size=3)]
           for _ in range(8)]
    for s in src:
        vs.add_tokenized_text(s)
    for t in tgt:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="penc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    att = Attention(name="patt", encoder=enc)
    dec = Decoder(name="pdec", vocabulary=vt, data_id="target",
                  max_output_len=5, rnn_size=6, encoders=[enc],
                  attentions=[att], embedding_size=8)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-2))
    return trainer, Dataset("toy", {"source": src, "target": tgt})


def test_bf16_training_tracks_f32():
    from neuralmonkey_tpu.runtime import TPUManager
    losses = {}
    for mode in (None, "bfloat16"):
        policy.set_compute_dtype(mode)
        trainer, ds = _toy()
        manager = TPUManager(random_seed=1)
        manager.initialize_model_parts([trainer], seed=1)
        losses[mode] = [
            manager.train_on_batch(trainer, ds, batch_size=8)["loss"]
            for _ in range(4)]
        # master params stay f32 after updates under the policy
        for leaf in jax.tree_util.tree_leaves(manager.params):
            assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    np.testing.assert_allclose(losses[None], losses["bfloat16"],
                               rtol=0.05)


def test_bf16_beam_scores_close_to_f32():
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    trainer, ds = _toy()
    dec = trainer.all_parts[0]
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds, train=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    bs = BeamSearchDecoder(name="pbs", parent_decoder=dec, beam_size=3)

    policy.set_compute_dtype(None)
    ref = jax.jit(lambda p, b: bs.search(
        Context(p, b, train=False)))(params, batch)
    policy.set_compute_dtype("bfloat16")
    low = jax.jit(lambda p, b: bs.search(
        Context(p, b, train=False)))(params, batch)
    np.testing.assert_allclose(np.asarray(ref.scores),
                               np.asarray(low.scores), atol=0.05)
