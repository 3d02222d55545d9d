"""Fused lineage decode-attention kernel (ops/lineage_attention.py).

Golden-tests the Pallas kernel (interpret mode on CPU) against its
pure-JAX twin AND against the product einsum formulation in
decode_step_lineage, then drives a full beam search with the kernel
layout engaged and compares to the einsum path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.ops import kernel_config
from neuralmonkey_tpu.ops import lineage_attention as la

RNG = np.random.RandomState(13)


@pytest.fixture(autouse=True)
def pallas_forced(monkeypatch):
    monkeypatch.setenv("NM_USE_PALLAS", "1")
    kernel_config._use_pallas_cached.cache_clear()
    yield
    kernel_config.note_mesh(None)
    kernel_config._use_pallas_cached.cache_clear()


def _setup(batch=2, beam=5, heads=2, dh=8, length=12, step=7,
           win=None):
    win = length if win is None else win
    k16 = la._pad8(beam)
    lanes_total = beam * length
    q4 = jnp.asarray(RNG.randn(batch, heads, k16, dh), jnp.float32)
    kq = jnp.asarray(
        RNG.randn(batch, heads, dh, lanes_total), jnp.float32)
    vq = jnp.asarray(
        RNG.randn(batch, heads, lanes_total, dh), jnp.float32)
    anc = jnp.asarray(
        RNG.randint(0, beam, size=(batch, beam, length)), jnp.int32)
    win_lanes = la.lane_window(win, beam, lanes_total)
    bias = la.lineage_bias(anc, step, win, beam, win_lanes, length)
    return q4, kq, vq, anc, bias, win_lanes, step, win


@pytest.mark.parametrize("win", [None, 8])
def test_kernel_matches_reference_twin(win):
    q4, kq, vq, anc, bias, win_lanes, step, win_ = _setup(win=win)
    out = la.lineage_attention(q4, kq, vq, bias, win_lanes)
    ref = la.lineage_attention_reference(
        q4, kq[..., :win_lanes], vq[:, :, :win_lanes], bias, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flat_softmax_equals_product_einsums():
    """The kernel's flat (slot, time) softmax with the one-hot -inf
    bias must equal the product path's lineage-reduced softmax (the
    einsum formulation in decode_step_lineage) given the same cache
    contents in both layouts."""
    batch, beam, heads, dh, length, step = 2, 5, 2, 8, 12, 7
    win = length
    q4, kq, vq, anc, bias, win_lanes, _, _ = _setup(
        batch, beam, heads, dh, length, step)
    out = la.lineage_attention(q4, kq, vq, bias, win_lanes)

    # rebuild the row-major caches: cache[b*K + j, t] = kq[b,:, :,
    # t*K + j]
    lane = jnp.arange(beam * length)
    t_of, j_of = lane // beam, lane % beam
    k_rows = np.zeros((batch * beam, length, heads * dh), np.float32)
    v_rows = np.zeros_like(k_rows)
    kq_n, vq_n = np.asarray(kq), np.asarray(vq)
    for b in range(batch):
        for li in range(beam * length):
            t, j = int(t_of[li]), int(j_of[li])
            k_rows[b * beam + j, t] = kq_n[b, :, :, li].reshape(-1)
            v_rows[b * beam + j, t] = vq_n[b, :, li, :].reshape(-1)
    kh = jnp.asarray(k_rows).reshape(batch, beam, length, heads, dh)
    vh = jnp.asarray(v_rows).reshape(batch, beam, length, heads, dh)
    qh = q4[:, :, :beam].transpose(0, 2, 1, 3)   # (B, K, H, Dh)

    lineage = (anc[:, :, None, :]
               == jnp.arange(beam, dtype=anc.dtype)[
                   None, None, :, None]).astype(jnp.float32)
    cache_bias = jnp.where(jnp.arange(length) <= step, 0.0,
                           -1e9)[None, None, None, :]
    scale = 1.0 / (dh ** 0.5)
    s_full = jnp.einsum("bkhd,bjthd->bhkjt", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    s = jnp.einsum("bhkjt,bkjt->bhkt", s_full, lineage)
    weights = jax.nn.softmax(s + cache_bias, axis=-1)
    w_slot = jnp.einsum("bhkt,bkjt->bhkjt", weights, lineage)
    ctx = jnp.einsum("bhkjt,bjthd->bkhd", w_slot, vh,
                     preferred_element_type=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out[:, :, :beam].transpose(0, 2, 1, 3)),
        np.asarray(ctx), atol=1e-5, rtol=1e-5)


def _toy_search(monkeypatch, env):
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.models.decoders.transformer import \
        TransformerDecoder
    from neuralmonkey_tpu.models.encoders.transformer import \
        TransformerEncoder
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.vocabulary import Vocabulary

    monkeypatch.setenv("NM_USE_PALLAS", env)
    # the kernel path is opt-in (measured slower than the einsum path
    # at bench shapes — docs/performance.md round-5 anatomy)
    monkeypatch.setenv("NM_LINEAGE_KERNEL", env)
    kernel_config._use_pallas_cached.cache_clear()
    vocab = Vocabulary()
    for i in range(30):
        vocab.add_word(f"w{i}")
    enc = TransformerEncoder(
        name="lak_src", vocabulary=vocab, data_id="source",
        embedding_size=16, ff_hidden_size=32, depth=2, n_heads=4)
    dec = TransformerDecoder(
        name="lak_tgt", vocabulary=vocab, data_id="target",
        encoders=[enc], embedding_size=16, ff_hidden_size=32, depth=2,
        n_heads_self=4, n_heads_enc=4, max_output_len=9,
        tie_embeddings=False)
    bs = BeamSearchDecoder(name="lak_bs", parent_decoder=dec,
                           beam_size=4, length_normalization=0.6)
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    batch = {
        "lak_src_input.ids": jnp.asarray(
            rng.randint(4, 30, size=(4, 6)), jnp.int32),
        "lak_src_input.mask": jnp.ones((4, 6), jnp.float32),
    }
    ctx = Context(params, batch, train=False)
    out = bs.search(ctx)
    return (np.asarray(out.token_ids), np.asarray(out.scores),
            np.asarray(out.lengths))


def test_beam_search_with_kernel_matches_einsum_path(monkeypatch):
    calls = {"n": 0}
    real = la.lineage_attention

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(la, "lineage_attention", counted)
    ids_on, scores_on, len_on = _toy_search(monkeypatch, "1")
    assert calls["n"] > 0, "kernel layout did not engage"
    n_on = calls["n"]
    ids_off, scores_off, len_off = _toy_search(monkeypatch, "0")
    assert calls["n"] == n_on, "einsum path still used the kernel"
    np.testing.assert_allclose(scores_on, scores_off,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(ids_on, ids_off)
    np.testing.assert_array_equal(len_on, len_off)


def test_kernel_gate_rejects_long_caches():
    assert la.lineage_kernel_ok(10, 8, 64, 48)
    assert not la.lineage_kernel_ok(10, 8, 64, 4096)  # lane blowup
    assert not la.lineage_kernel_ok(10, 8, 72, 48)    # bad head dim
