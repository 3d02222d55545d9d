"""Checkpoint averaging + new vocabulary factory tests."""

import numpy as np

from neuralmonkey_tpu.utils.average_checkpoints import (
    average_checkpoints, average_flat)
from neuralmonkey_tpu.utils.saving import load_flat, save_tree


def test_average_flat():
    a = {"x/w": np.ones((2, 2)), "y": np.zeros((3,))}
    b = {"x/w": 3 * np.ones((2, 2)), "y": np.ones((3,))}
    avg = average_flat([a, b])
    np.testing.assert_allclose(avg["x/w"], 2.0)
    np.testing.assert_allclose(avg["y"], 0.5)


def test_average_checkpoints_roundtrip(tmp_path):
    tree1 = {"part": {"w": np.ones((4,)), "b": np.zeros((2,))}}
    tree2 = {"part": {"w": 3 * np.ones((4,)), "b": np.ones((2,))}}
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    save_tree(p1, tree1)
    save_tree(p2, tree2)
    out = str(tmp_path / "avg.npz")
    average_checkpoints([p1, p2], out)
    flat = load_flat(out)
    np.testing.assert_allclose(flat["part/w"], 2.0)
    np.testing.assert_allclose(flat["part/b"], 0.5)


def test_restore_average_folds_checkpoints(tmp_path):
    """TPUManager.restore(average=True) — the runtime counterpart of
    the offline utility (exposed as --average on run/server): K
    checkpoint paths fold into ONE parameter set whose leaves are the
    checkpoint means, instead of a K-way logit ensemble."""
    import jax
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.models.attention.feed_forward import Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    from neuralmonkey_tpu.runners.runner import GreedyRunner
    from neuralmonkey_tpu.runtime import TPUManager
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vs, vt = Vocabulary(), Vocabulary()
    src = [[f"s{j}" for j in range(3)] for _ in range(4)]
    tgt = [[f"t{j}" for j in range(2)] for _ in range(4)]
    for s, t in zip(src, tgt):
        vs.add_tokenized_text(s)
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="avg_enc", vocabulary=vs,
                          data_id="source", embedding_size=8,
                          rnn_size=6)
    att = Attention(name="avg_att", encoder=enc)
    dec = Decoder(name="avg_dec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=5e-2))
    runner = GreedyRunner(output_series="target", decoder=dec)
    ds = Dataset("toy", {"source": src, "target": tgt})

    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts([trainer, runner], seed=0)
    c1 = manager.save(str(tmp_path / "vars"), step=1)
    manager.train_on_batch(trainer, ds, batch_size=4)
    manager.train_on_batch(trainer, ds, batch_size=4)
    c2 = manager.save(str(tmp_path / "vars"), step=2)
    p1 = jax.tree_util.tree_map(np.asarray, manager.params_list[0])

    # plain list restore => 2-entry logit ensemble
    manager.restore([c1, c2])
    assert len(manager.params_list) == 2
    p_first = manager.params_list[0]

    # averaged restore => one entry, leaves = mean of the checkpoints
    manager.restore([c1, c2], average=True)
    assert len(manager.params_list) == 1
    want = jax.tree_util.tree_map(
        lambda a, b: (np.asarray(a) + np.asarray(b)) / 2.0,
        p_first, jax.tree_util.tree_map(np.asarray, p1))
    got = jax.tree_util.tree_map(np.asarray, manager.params_list[0])
    flat_w = jax.tree_util.tree_leaves(want)
    flat_g = jax.tree_util.tree_leaves(got)
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # and the averaged model decodes through the product path
    outs = manager.run_on_batch([runner], ds, batch_size=4)[0].outputs
    assert len(outs) == 4


def test_vocab_from_bpe(tmp_path):
    merges = tmp_path / "m.bpe"
    merges.write_text("#version: 0.2\nt h\nth e</w>\n")
    from neuralmonkey_tpu.vocabulary import from_bpe
    vocab = from_bpe(str(merges))
    assert "th" in vocab
    assert "the" in vocab
    assert "th@@" in vocab
