"""Optimizer-state persistence across continuation (reference
tf.train.Saver kept slot variables inside variables.data; here the
optax state is written next to each checkpoint as <path>.opt and
restored by trainer label on --cont)."""

import jax
import numpy as np
import pytest

from neuralmonkey_tpu.dataset import Dataset
from neuralmonkey_tpu.models.attention.feed_forward import Attention
from neuralmonkey_tpu.models.decoders.decoder import Decoder
from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
from neuralmonkey_tpu.runtime import TPUManager
from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
    CrossEntropyTrainer
from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
from neuralmonkey_tpu.vocabulary import Vocabulary


@pytest.fixture(scope="module")
def problem():
    vs, vt = Vocabulary(), Vocabulary()
    rng = np.random.RandomState(1)
    src = [[f"s{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(8)]
    tgt = [[f"t{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(8)]
    for s in src:
        vs.add_tokenized_text(s)
    for t in tgt:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="enc_r", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    att = Attention(name="att_r", encoder=enc)
    dec = Decoder(name="dec_r", vocabulary=vt, data_id="target",
                  max_output_len=8, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    # high LR so Adam-moment resets visibly change the trajectory
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=5e-2))
    ds = Dataset("toy", {"source": src, "target": tgt})
    return trainer, ds


def _fresh_manager(problem):
    trainer, ds = problem
    manager = TPUManager(random_seed=3)
    manager.initialize_model_parts([trainer], seed=3)
    return manager


def _steps(manager, problem, n):
    trainer, ds = problem
    return [manager.train_on_batch(trainer, ds, batch_size=8)["loss"]
            for _ in range(n)]


def test_resume_continues_adam_trajectory(problem, tmp_path):
    # uninterrupted reference run: 6 steps
    ref_losses = _steps(_fresh_manager(problem), problem, 6)

    # interrupted at step 3
    m_first = _fresh_manager(problem)
    first_losses = _steps(m_first, problem, 3)
    np.testing.assert_allclose(first_losses, ref_losses[:3], rtol=1e-5)
    base = str(tmp_path / "variables.data")
    ckpt = m_first.save(base)

    # resume with optimizer state: trajectory continues exactly
    m_resume = _fresh_manager(problem)
    m_resume.restore([ckpt])
    m_resume.load_optimizer_state(base)
    resumed = _steps(m_resume, problem, 3)
    np.testing.assert_allclose(resumed, ref_losses[3:], rtol=1e-5)

    # resume WITHOUT optimizer state: params match, so the first loss
    # is equal, but reset Adam moments change later steps
    m_cold = _fresh_manager(problem)
    m_cold.restore([ckpt])
    cold = _steps(m_cold, problem, 3)
    assert cold[0] == pytest.approx(ref_losses[3], rel=1e-5)
    assert not np.allclose(cold[1:], ref_losses[4:], rtol=1e-4)


def test_opt_state_label_mismatch_warns(problem, tmp_path):
    trainer, ds = problem
    manager = _fresh_manager(problem)
    _steps(manager, problem, 1)
    base = str(tmp_path / "variables.data")
    manager.save(base)

    other = CrossEntropyTrainer(
        decoders=trainer.all_parts, clip_norm=1.0, name="other",
        optimizer=AdamOptimizer(learning_rate=5e-2))
    m2 = TPUManager(random_seed=3)
    m2.initialize_model_parts([other], seed=3)
    m2.load_optimizer_state(base)
    # wrong label: falls back to fresh state, still trains
    loss = m2.train_on_batch(other, ds, batch_size=8)["loss"]
    assert np.isfinite(loss)
