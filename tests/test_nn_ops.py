"""NN primitive tests: cell equations (TF1 conventions), masked RNN
scans vs naive references (mirrors reference test_nn_utils.py intent,
plus the rebuild's golden-test policy for kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.ops import nn
from neuralmonkey_tpu.ops.rnn import bidirectional_rnn, unidirectional_rnn


def test_gru_cell_equations():
    """GRU must match the TF1 equations computed by hand in numpy."""
    cell = nn.GRUCell(3, 2)
    params = cell.init(jax.random.PRNGKey(0))
    x = np.array([[0.1, -0.2, 0.3]], np.float32)
    h = np.array([[0.5, -0.5]], np.float32)

    p = jax.tree_util.tree_map(np.asarray, params)
    gates = 1 / (1 + np.exp(-(x @ p["gates_x"] + h @ p["gates_h"]
                              + p["gates_b"])))
    r, u = gates[:, :2], gates[:, 2:]
    cand = np.tanh(x @ p["cand_x"] + (r * h) @ p["cand_h"] + p["cand_b"])
    expected = u * h + (1 - u) * cand

    new_h, out = cell(params, jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(new_h), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_gru_gate_bias_is_one():
    cell = nn.GRUCell(3, 4)
    params = cell.init(jax.random.PRNGKey(0))
    assert np.all(np.asarray(params["gates_b"]) == 1.0)


def test_lstm_cell_equations():
    cell = nn.LSTMCell(2, 3)
    params = cell.init(jax.random.PRNGKey(1))
    x = np.array([[0.3, -0.1]], np.float32)
    c = np.array([[0.2, 0.1, -0.4]], np.float32)
    h = np.array([[0.0, 0.5, 0.25]], np.float32)

    p = jax.tree_util.tree_map(np.asarray, params)
    z = x @ p["kernel_x"] + h @ p["kernel_h"] + p["bias"]
    i, j, f, o = np.split(z, 4, axis=1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    new_c = c * sig(f + 1.0) + sig(i) * np.tanh(j)
    new_h = np.tanh(new_c) * sig(o)

    (nc, nh), out = cell(params, (jnp.asarray(c), jnp.asarray(h)),
                         jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(nc), new_c, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nh), new_h, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), new_h, rtol=1e-5)


def test_orthogonal_init():
    w = nn.orthogonal(jax.random.PRNGKey(0), (6, 6))
    eye = np.asarray(w) @ np.asarray(w).T
    np.testing.assert_allclose(eye, np.eye(6), atol=1e-5)


def _naive_rnn(cell, params, inputs, lengths):
    """Per-example python-loop reference."""
    outs = np.zeros(inputs.shape[:2] + (cell.state_size,), np.float32)
    finals = []
    for b in range(inputs.shape[0]):
        state = jax.tree_util.tree_map(
            lambda s: s[b:b + 1],
            cell.initial_state(inputs.shape[0]))
        for t in range(lengths[b]):
            state, out = cell(params, state, inputs[b:b + 1, t])
            outs[b, t] = np.asarray(out)[0]
        finals.append(np.asarray(cell.output(state))[0])
    return outs, np.stack(finals)


def test_masked_unidirectional_rnn_matches_naive():
    cell = nn.GRUCell(4, 3)
    params = cell.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(3, 5, 4).astype(np.float32))
    lengths = [5, 3, 1]
    mask = jnp.asarray(
        np.array([[1.0] * l + [0.0] * (5 - l) for l in lengths],
                 np.float32))
    outputs, final = unidirectional_rnn(cell, params, inputs, mask)
    ref_out, ref_final = _naive_rnn(cell, params, np.asarray(inputs),
                                    lengths)
    np.testing.assert_allclose(np.asarray(outputs), ref_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final), ref_final, atol=1e-5)


def test_masked_bidirectional_final_state():
    """Backward final state must equal the state after reading token 0,
    regardless of padding."""
    cell_fw = nn.GRUCell(2, 3)
    cell_bw = nn.GRUCell(2, 3)
    p_fw = cell_fw.init(jax.random.PRNGKey(3))
    p_bw = cell_bw.init(jax.random.PRNGKey(4))
    rng = np.random.RandomState(1)
    # same sentence, different padding
    sent = rng.randn(1, 3, 2).astype(np.float32)
    padded = np.concatenate(
        [sent, np.zeros((1, 2, 2), np.float32)], axis=1)
    mask3 = jnp.asarray([[1.0, 1.0, 1.0]])
    mask5 = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0]])
    _, final_a = bidirectional_rnn(cell_fw, p_fw, cell_bw, p_bw,
                                   jnp.asarray(sent), mask3)
    _, final_b = bidirectional_rnn(cell_fw, p_fw, cell_bw, p_bw,
                                   jnp.asarray(padded), mask5)
    np.testing.assert_allclose(np.asarray(final_a), np.asarray(final_b),
                               atol=1e-5)


def test_maxout():
    params = nn.maxout_init(jax.random.PRNGKey(5), 4, 3, pool_size=2)
    x = jnp.ones((2, 4))
    y = nn.maxout(params, x)
    assert y.shape == (2, 3)
    # maxout(x) >= either linear piece
    lin = nn.linear(params, x).reshape(2, 3, 2)
    assert np.all(np.asarray(y)[..., None] >= np.asarray(lin) - 1e-6)


def test_highway_shape_and_carry():
    params = nn.highway_init(jax.random.PRNGKey(6), 4)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 4), jnp.float32)
    y = nn.highway(params, x)
    assert y.shape == x.shape


def test_dropout():
    x = jnp.ones((1000,))
    key = jax.random.PRNGKey(7)
    y = nn.dropout(x, 0.5, key, train=True)
    kept = np.asarray(y) > 0
    assert 0.35 < kept.mean() < 0.65
    # inverted scaling preserves expectation
    assert abs(float(jnp.mean(y)) - 1.0) < 0.15
    # identity outside training
    np.testing.assert_array_equal(
        np.asarray(nn.dropout(x, 0.5, key, train=False)), np.asarray(x))


def test_noisy_gru_training_noise():
    """NoisyGRU: inference is deterministic hard saturation; training
    with a noise rng perturbs saturated activations (Gülçehre et al.
    2016) and stays differentiable."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neuralmonkey_tpu.ops.nn import NoisyGRUCell
    from neuralmonkey_tpu.ops.rnn import unidirectional_rnn

    cell = NoisyGRUCell(4, 5)
    params = cell.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # large-magnitude inputs so activations saturate (noise is scaled
    # by saturation depth and vanishes in the linear region)
    x = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32) * 8)
    mask = jnp.ones((2, 6), jnp.float32)

    out_a, _ = unidirectional_rnn(cell, params, x, mask)
    out_b, _ = unidirectional_rnn(cell, params, x, mask)
    np.testing.assert_array_equal(np.asarray(out_a),
                                  np.asarray(out_b))  # deterministic

    n1, _ = unidirectional_rnn(cell, params, x, mask,
                               noise_rng=jax.random.PRNGKey(1))
    n2, _ = unidirectional_rnn(cell, params, x, mask,
                               noise_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(n1), np.asarray(n2))
    assert not np.allclose(np.asarray(n1), np.asarray(out_a))

    def loss(p):
        out, _ = unidirectional_rnn(cell, p, x, mask,
                                    noise_rng=jax.random.PRNGKey(3))
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(g).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_noisy_gru_trains_through_encoder():
    """rnn_cell="NoisyGRU" in a SentenceEncoder: the train path draws
    noise (ctx.train), the inference path is deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.models.attention.feed_forward import Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.encoders.recurrent import \
        SentenceEncoder
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vs, vt = Vocabulary(), Vocabulary()
    src = [["a", "b"], ["b", "a", "a"]]
    tgt = [["x"], ["y", "x"]]
    for s in src:
        vs.add_tokenized_text(s)
    for t in tgt:
        vt.add_tokenized_text(t)
    enc = SentenceEncoder(name="nenc", vocabulary=vs, data_id="source",
                          embedding_size=6, rnn_size=5,
                          rnn_cell="NoisyGRU")
    att = Attention(name="natt", encoder=enc)
    dec = Decoder(name="ndec", vocabulary=vt, data_id="target",
                  max_output_len=4, rnn_size=5, encoders=[enc],
                  attentions=[att], embedding_size=6,
                  rnn_cell="NoisyGRU")
    ds = Dataset("toy", {"source": src, "target": tgt})
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    batch = {}
    for p in parts:
        batch.update(p.featurize(ds, train=True))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = {seed: float(dec.train_loss(Context(
        params, batch, train=True, rng=jax.random.PRNGKey(seed))))
        for seed in (1, 2)}
    assert np.isfinite(list(losses.values())).all()
    # inference path: deterministic
    ids_a = np.asarray(dec.decoded(Context(params, batch, train=False)))
    ids_b = np.asarray(dec.decoded(Context(params, batch, train=False)))
    np.testing.assert_array_equal(ids_a, ids_b)
