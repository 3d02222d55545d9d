"""Worker for the 2-process jax.distributed integration test.

Each process gets 4 virtual CPU devices; together they form one
8-device ('data',) mesh. ``run_training`` is shared with the parent
test, which runs it single-process on its own 8-device mesh and
compares losses step-for-step (the multi-process run must be
numerically identical — same global mesh, same SPMD program).

Usage: python distributed_worker.py <proc_id> <port> <out_dir> <steps>
"""

import json
import os
import sys


def build_model():
    """Deterministic toy seq2seq (mirrors tests/test_data_parallel.py)."""
    import numpy as np
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.models.attention.feed_forward import Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.vocabulary import Vocabulary

    rng = np.random.RandomState(0)
    src = [[f"s{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(16)]
    tgt = [[f"t{i}" for i in rng.randint(0, 20, size=rng.randint(2, 7))]
           for _ in range(16)]
    vs, vt = Vocabulary(), Vocabulary()
    for s in src:
        vs.add_tokenized_text(s)
    for t in tgt:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="enc", vocabulary=vs, data_id="source",
                          embedding_size=8, rnn_size=6)
    att = Attention(name="att", encoder=enc)
    dec = Decoder(name="dec", vocabulary=vt, data_id="target",
                  max_output_len=8, rnn_size=7, encoders=[enc],
                  attentions=[att], embedding_size=8)
    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    ds = Dataset("toy", {"source": src, "target": tgt})
    return trainer, ds


def run_training(ckpt_dir: str, restore_dir: str, n_steps: int) -> dict:
    """Train n_steps on the fixed batch, checkpoint, restore from
    ``restore_dir``'s checkpoint, train one more step. Returns the
    loss trajectory + file census of this process's checkpoint dir."""
    from neuralmonkey_tpu.runtime import TPUManager

    trainer, ds = build_model()
    manager = TPUManager(random_seed=3)
    manager.initialize_model_parts([trainer], seed=3)

    losses = []
    for _ in range(n_steps):
        losses.append(float(
            manager.train_on_batch(trainer, ds, batch_size=16)["loss"]))

    os.makedirs(ckpt_dir, exist_ok=True)
    var_path = os.path.join(ckpt_dir, "variables.data")
    manager.save(var_path)
    written = sorted(os.listdir(ckpt_dir))

    # restore (every process reads process 0's checkpoint) and verify
    # training continues identically everywhere
    restore_path = os.path.join(
        restore_dir, f"variables.data-{manager.global_step}")
    manager.restore([restore_path])
    post_restore_loss = float(
        manager.train_on_batch(trainer, ds, batch_size=16)["loss"])

    return {"losses": losses,
            "post_restore_loss": post_restore_loss,
            "written": written}


def main() -> None:
    proc_id, port, out_dir, n_steps = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4]))
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from neuralmonkey_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=proc_id)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    ckpt_dir = os.path.join(out_dir, f"proc{proc_id}")
    restore_dir = os.path.join(out_dir, "proc0")
    result = run_training(ckpt_dir, restore_dir, n_steps)
    result["process"] = proc_id
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
