"""Golden tests: Pallas kernels vs pure-JAX reference implementations
(interpret mode on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmonkey_tpu.ops import nn
from neuralmonkey_tpu.ops.attention import (attention_bias_from_mask,
                                            causal_bias,
                                            dot_product_attention)
from neuralmonkey_tpu.ops.pallas_attention import (flash_attention,
                                                   fused_bahdanau_step)
from neuralmonkey_tpu.ops.pallas_rnn import (bidirectional_gru_scan,
                                             gru_scan)
from neuralmonkey_tpu.ops.rnn import (bidirectional_rnn,
                                      unidirectional_rnn)

RNG = np.random.RandomState(0)


def _mask(batch, time, lengths):
    mask = np.zeros((batch, time), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :l] = 1.0
    return jnp.asarray(mask)


# ---------------------------------------------------------------------- #
# fused GRU scan
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("reverse", [False, True])
def test_gru_scan_matches_lax_scan(reverse):
    cell = nn.GRUCell(6, 5)
    params = cell.init(jax.random.PRNGKey(0))
    inputs = jnp.asarray(RNG.randn(3, 7, 6), jnp.float32)
    mask = _mask(3, 7, [7, 4, 2])

    ref_out, ref_final = unidirectional_rnn(
        cell, params, inputs, mask, reverse=reverse)
    out, final = gru_scan(params, inputs, mask, reverse=reverse,
                          batch_tile=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=1e-5)


def test_bidirectional_gru_scan():
    fw = nn.GRUCell(4, 3)
    bw = nn.GRUCell(4, 3)
    p_fw = fw.init(jax.random.PRNGKey(1))
    p_bw = bw.init(jax.random.PRNGKey(2))
    inputs = jnp.asarray(RNG.randn(5, 6, 4), jnp.float32)
    mask = _mask(5, 6, [6, 5, 3, 2, 1])

    ref_out, ref_final = bidirectional_rnn(fw, p_fw, bw, p_bw,
                                           inputs, mask)
    out, final = bidirectional_gru_scan(p_fw, p_bw, inputs, mask,
                                        batch_tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=1e-5)


# ---------------------------------------------------------------------- #
# flash attention
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal):
    batch, heads, q_len, kv_len, dim = 2, 3, 10, 12, 8
    q = jnp.asarray(RNG.randn(batch, heads, q_len, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, kv_len, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, kv_len, dim), jnp.float32)
    mask = _mask(batch, kv_len, [12, 7])

    bias = attention_bias_from_mask(mask)
    if causal:
        # causal reference only valid for square q/k
        q = q[:, :, :kv_len - 2, :]
        cb = causal_bias(kv_len)[:, :, :q.shape[2], :]
        bias = bias + cb
    ref = dot_product_attention(q, k, v, bias)
    out = flash_attention(q, k, v, mask, causal=causal,
                          block_q=4, block_kv=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [128, 512])
def test_flash_attention_backward_matches_reference(causal, t):
    """Hand-written dq/dk/dv kernels vs XLA gradients through the
    pure-JAX reference, at the long-sequence shapes the kernels exist
    for (VERDICT r1 item 1: T∈{128, 512})."""
    from neuralmonkey_tpu.ops.pallas_attention import _reference_flash
    rng = np.random.RandomState(3)
    batch, heads, dim = 2, 2, 32
    q = jnp.asarray(rng.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(rng.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(rng.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [t, t - t // 3])
    cot = jnp.asarray(rng.randn(batch, heads, t, dim), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * cot)

    g_pal = jax.grad(
        lambda *a: loss(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, mask,
                                               causal=causal), *a),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda *a: loss(
            lambda q_, k_, v_: _reference_flash(q_, k_, v_, mask,
                                                causal), *a),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("q k v".split(), g_pal, g_ref):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=2e-5, err_msg=f"d{name} t={t} causal={causal}")


def test_flash_attention_backward_odd_shapes():
    """Backward padding path: lengths not divisible by the 128 blocks,
    head dim below a lane."""
    from neuralmonkey_tpu.ops.pallas_attention import _reference_flash
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(2, 2, 37, 12), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 53, 12), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 53, 12), jnp.float32)
    mask = _mask(2, 53, [53, 29])
    cot = jnp.asarray(rng.randn(2, 2, 37, 12), jnp.float32)
    g_pal = jax.grad(lambda q_, k_, v_: jnp.sum(
        flash_attention(q_, k_, v_, mask) * cot),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q_, k_, v_: jnp.sum(
        _reference_flash(q_, k_, v_, mask, False) * cot),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_attention_with_padding_blocks():
    """Lengths not divisible by block sizes exercise the padding path."""
    q = jnp.asarray(RNG.randn(1, 2, 5, 4), jnp.float32)
    k = jnp.asarray(RNG.randn(1, 2, 9, 4), jnp.float32)
    v = jnp.asarray(RNG.randn(1, 2, 9, 4), jnp.float32)
    mask = _mask(1, 9, [8])
    ref = dot_product_attention(q, k, v, attention_bias_from_mask(mask))
    out = flash_attention(q, k, v, mask, block_q=4, block_kv=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------- #
# fused Bahdanau step
# ---------------------------------------------------------------------- #
def test_fused_bahdanau_matches_reference():
    from neuralmonkey_tpu.models.attention.base_attention import \
        masked_softmax
    batch, time, att_dim, state_dim = 5, 7, 6, 9
    keys = jnp.asarray(RNG.randn(batch, time, att_dim), jnp.float32)
    states = jnp.asarray(RNG.randn(batch, time, state_dim),
                         jnp.float32)
    mask = _mask(batch, time, [7, 6, 3, 2, 1])
    pq = jnp.asarray(RNG.randn(batch, att_dim), jnp.float32)
    v = jnp.asarray(RNG.randn(att_dim), jnp.float32)

    energies = jnp.einsum("bta,a->bt",
                          jnp.tanh(keys + pq[:, None, :]), v)
    ref_w = masked_softmax(energies, mask)
    ref_ctx = jnp.einsum("bt,btd->bd", ref_w, states)

    ctx, weights = fused_bahdanau_step(keys, states, mask, pq, v,
                                       batch_tile=2)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(ref_w),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref_ctx),
                               atol=1e-5)


# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("shape", [(16, 256), (8, 128), (64, 3840),
                                   (40, 1280)])
def test_rowmax_lse_matches_reference(shape):
    """Fused beam-selection reductions (one HBM read on TPU) vs the
    pure-JAX twin."""
    from neuralmonkey_tpu.ops.beam_select import (_rowmax_lse_pallas,
                                                  _rowmax_lse_reference)
    n, vp = shape
    x = jnp.asarray(RNG.randn(n, vp).astype(np.float32) * 4)
    rm_p, lse_p = _rowmax_lse_pallas(x)    # interpret mode on CPU
    rm_r, lse_r = _rowmax_lse_reference(x)
    np.testing.assert_allclose(np.asarray(rm_p), np.asarray(rm_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_r),
                               rtol=1e-6)


@pytest.mark.parametrize("shape", [(16, 128, 1280), (64, 256, 640),
                                   (24, 128, 512), (40, 512, 3840)])
def test_fused_logits_rowmax_lse_matches_reference(shape):
    """Logit projection with the selector reductions fused into its
    epilogue (one logits write, no re-read) vs the pure-JAX twin."""
    from neuralmonkey_tpu.ops.beam_select import (
        _fused_logits_rowmax_lse_reference, _fused_pallas,
        _fused_tiling)
    n, d, vp = shape
    x = jnp.asarray(RNG.randn(n, d).astype(np.float32))
    w = jnp.asarray(RNG.randn(d, vp).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.randn(1, vp).astype(np.float32))
    tiling = _fused_tiling(n, d, vp)
    assert tiling is not None
    got = _fused_pallas(x, w, b, tiling)   # interpret mode on CPU
    ref = _fused_logits_rowmax_lse_reference(x, w, b)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(16, 128, 1024), (40, 512, 4096)])
def test_fused_logits_3d_matches_reference(shape):
    """Window-tiled (N, R, 128) logits emission (Vp/128 % 8 == 0):
    same values as the 2-D reference, reshaped — the layout the beam
    selector's stage-2 gather reads without an HBM relayout."""
    from neuralmonkey_tpu.ops.beam_select import (
        _fused_logits_rowmax_lse_reference, _fused_pallas,
        _fused_tiling)
    n, d, vp = shape
    x = jnp.asarray(RNG.randn(n, d).astype(np.float32))
    w = jnp.asarray(RNG.randn(d, vp).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.randn(1, vp).astype(np.float32))
    tiling = _fused_tiling(n, d, vp)
    assert tiling is not None and tiling[2] % 8 == 0
    got = _fused_pallas(x, w, b, tiling, logits_3d=True)
    ref = _fused_logits_rowmax_lse_reference(x, w, b)
    assert got[0].shape == (n, vp // 128, 128)
    np.testing.assert_allclose(
        np.asarray(got[0]).reshape(n, vp), np.asarray(ref[0]),
        atol=2e-5, rtol=1e-5)
    for g, r in zip(got[1:], ref[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-5)


def test_fused_logits_3d_public_dispatch():
    """fused_logits_rowmax_lse(logits_3d=True) returns (N, R, 128)
    on every path, including the reference fallback."""
    from neuralmonkey_tpu.ops.beam_select import fused_logits_rowmax_lse
    x = jnp.asarray(RNG.randn(16, 128).astype(np.float32))
    w = jnp.asarray(RNG.randn(128, 1024).astype(np.float32) * 0.1)
    b = jnp.zeros((1, 1024), jnp.float32)
    for force in (True, False):
        logits, rm, lse = fused_logits_rowmax_lse(
            x, w, b, force_pallas=force, logits_3d=True)
        assert logits.shape == (16, 8, 128)
        assert rm.shape == (16, 8) and lse.shape == (16,)


def test_fused_logits_dispatch_fallback():
    """Ineligible shapes (N % 8, D % 128) take the reference path."""
    from neuralmonkey_tpu.ops.beam_select import fused_logits_rowmax_lse
    x = jnp.asarray(RNG.randn(5, 96).astype(np.float32))
    w = jnp.asarray(RNG.randn(96, 256).astype(np.float32))
    b = jnp.zeros((1, 256), jnp.float32)
    logits, rm, lse = fused_logits_rowmax_lse(x, w, b)
    assert logits.shape == (5, 256)
    assert rm.shape == (5, 2) and lse.shape == (5,)


def test_rowmax_lse_dispatch_shapes():
    """Non-kernel-eligible shapes fall back to the reference."""
    from neuralmonkey_tpu.ops.beam_select import rowmax_lse
    x = jnp.asarray(RNG.randn(5, 256).astype(np.float32))  # N % 8 != 0
    rm, lse = rowmax_lse(x)
    assert rm.shape == (5, 2) and lse.shape == (5,)


@pytest.mark.parametrize("shape,k", [((5, 100), 3), ((64, 2350), 10),
                                     ((16, 1280), 10), ((8, 128), 5)])
def test_small_topk_matches_lax(shape, k):
    """Exact top-k kernel vs lax.top_k, including lowest-index ties."""
    from neuralmonkey_tpu.ops.beam_select import (_topk_pallas,
                                                  _topk_reference)
    x = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 3)
    x = jnp.round(x)  # force ties
    v_p, i_p = _topk_pallas(x, k)
    v_r, i_r = _topk_reference(x, k)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))


# ---------------------------------------------------------------------- #
# fused GRU scan: hand-written BPTT kernel vs XLA-derived gradients
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("reverse", [False, True])
def test_gru_scan_gradients_match_lax_scan(reverse):
    cell = nn.GRUCell(6, 5)
    params = cell.init(jax.random.PRNGKey(3))
    inputs = jnp.asarray(RNG.randn(3, 7, 6), jnp.float32)
    mask = _mask(3, 7, [7, 4, 2])

    def loss_ref(p, x):
        out, final = unidirectional_rnn(
            cell, p, x, mask, reverse=reverse, allow_pallas=False)
        return jnp.sum(out * out) + jnp.sum(jnp.tanh(final))

    def loss_pallas(p, x):
        out, final = gru_scan(p, x, mask, reverse=reverse,
                              batch_tile=2)
        return jnp.sum(out * out) + jnp.sum(jnp.tanh(final))

    ref_grads = jax.grad(loss_ref, argnums=(0, 1))(params, inputs)
    got_grads = jax.grad(loss_pallas, argnums=(0, 1))(params, inputs)
    for ref, got in zip(jax.tree_util.tree_leaves(ref_grads),
                        jax.tree_util.tree_leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_bidirectional_gru_scan_grads_in_train_step(monkeypatch):
    """End-to-end: a jitted value_and_grad through the bidirectional
    Pallas scan equals the XLA-scan gradients. NM_USE_PALLAS=1 forces
    the dispatch gate open on CPU (interpret mode)."""
    from neuralmonkey_tpu.ops import kernel_config
    monkeypatch.setenv("NM_USE_PALLAS", "1")
    kernel_config._use_pallas_cached.cache_clear()
    fw, bw = nn.GRUCell(4, 3), nn.GRUCell(4, 3)
    p = {"fw": fw.init(jax.random.PRNGKey(4)),
         "bw": bw.init(jax.random.PRNGKey(5))}
    inputs = jnp.asarray(RNG.randn(5, 6, 4), jnp.float32)
    mask = _mask(5, 6, [6, 5, 3, 2, 1])

    def loss(params, use_pallas):
        out, final = bidirectional_rnn(
            fw, params["fw"], bw, params["bw"], inputs, mask,
            allow_pallas=use_pallas)
        return jnp.mean(out ** 2) + jnp.mean(final ** 2)

    try:
        ref = jax.grad(lambda q: loss(q, False))(p)
        got = jax.jit(jax.grad(lambda q: loss(q, True)))(p)
    finally:
        monkeypatch.delenv("NM_USE_PALLAS")
        kernel_config._use_pallas_cached.cache_clear()
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_gru_vmem_gate_and_tile_autofit():
    from neuralmonkey_tpu.ops import pallas_rnn as pr
    # production shapes fit; huge hidden sizes do not (weights alone
    # exceed VMEM). Time never matters: the grid streams time slices.
    assert pr.fits_vmem(48, 512)
    assert pr.fits_vmem(4096, 512)
    assert not pr.fits_vmem(48, 2048)
    # the auto-fit shrinks the batch tile rather than overflowing
    tile = pr._fit_batch_tile(
        4096, 4096, lambda t: pr._bwd_block_bytes(t, 512))
    assert tile % 8 == 0 and 8 <= tile < 4096
    # and the kernel still matches the reference at a shrunken tile
    cell = nn.GRUCell(4, 3)
    params = cell.init(jax.random.PRNGKey(6))
    inputs = jnp.asarray(RNG.randn(5, 4, 4), jnp.float32)
    mask = _mask(5, 4, [4, 3, 2, 4, 1])
    ref_out, ref_final = unidirectional_rnn(
        cell, params, inputs, mask, allow_pallas=False)
    out, final = gru_scan(params, inputs, mask, batch_tile=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=1e-5)


def test_gru_scan_bf16_matches_xla_bf16():
    """Under the bf16 policy the kernel sees bf16 inputs/params; its
    f32-internal compute must track the XLA scan's f32-carry result."""
    cell = nn.GRUCell(6, 5)
    params32 = cell.init(jax.random.PRNGKey(7))
    params = {k: (v.astype(jnp.bfloat16) if v.ndim >= 2 else v)
              for k, v in params32.items()}
    inputs = jnp.asarray(RNG.randn(3, 7, 6), jnp.bfloat16)
    mask = _mask(3, 7, [7, 4, 2])
    ref_out, ref_final = unidirectional_rnn(
        cell, params, inputs, mask, allow_pallas=False)
    out, final = gru_scan(params, inputs, mask)
    assert out.dtype == ref_out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=3e-2)


# ---------------------------------------------------------------------- #
# fused LSTM scan + BPTT
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_scan_matches_lax_scan(reverse):
    from neuralmonkey_tpu.ops.pallas_rnn import lstm_scan
    cell = nn.LSTMCell(6, 5)
    params = cell.init(jax.random.PRNGKey(4))
    inputs = jnp.asarray(RNG.randn(3, 7, 6), jnp.float32)
    mask = _mask(3, 7, [7, 4, 2])

    ref_out, ref_final = unidirectional_rnn(
        cell, params, inputs, mask, reverse=reverse,
        allow_pallas=False)
    out, final = lstm_scan(params, inputs, mask, reverse=reverse,
                           forget_bias=cell.forget_bias, batch_tile=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(ref_final), atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_scan_bptt_matches_xla_grad(reverse):
    """Hand-written LSTM BPTT kernel vs XLA gradients through the
    lax.scan reference (values AND gradients)."""
    from neuralmonkey_tpu.ops.pallas_rnn import lstm_scan
    cell = nn.LSTMCell(6, 5)
    params = cell.init(jax.random.PRNGKey(5))
    inputs = jnp.asarray(RNG.randn(4, 9, 6), jnp.float32)
    mask = _mask(4, 9, [9, 6, 3, 1])
    cot_out = jnp.asarray(RNG.randn(4, 9, 5), jnp.float32)
    cot_fin = jnp.asarray(RNG.randn(4, 5), jnp.float32)

    def loss(run, params, inputs):
        out, fin = run(params, inputs)
        return jnp.sum(out * cot_out) + jnp.sum(fin * cot_fin)

    g_ref = jax.grad(
        lambda p, x: loss(
            lambda p_, x_: unidirectional_rnn(
                cell, p_, x_, mask, reverse=reverse,
                allow_pallas=False), p, x),
        argnums=(0, 1))(params, inputs)
    g_pal = jax.grad(
        lambda p, x: loss(
            lambda p_, x_: lstm_scan(
                p_, x_, mask, reverse, cell.forget_bias, 2), p, x),
        argnums=(0, 1))(params, inputs)
    for key in g_ref[0]:
        np.testing.assert_allclose(
            np.asarray(g_pal[0][key]), np.asarray(g_ref[0][key]),
            atol=1e-4, err_msg=f"d{key} reverse={reverse}")
    np.testing.assert_allclose(np.asarray(g_pal[1]),
                               np.asarray(g_ref[1]), atol=1e-4)


def test_lstm_dispatch_via_unidirectional_rnn(monkeypatch):
    """unidirectional_rnn routes LSTM cells onto the Pallas scan when
    kernels are enabled (same 1e-5 agreement as the GRU path)."""
    import neuralmonkey_tpu.ops.kernel_config as kc
    import neuralmonkey_tpu.ops.rnn as rnn_mod
    monkeypatch.setattr(kc, "use_pallas", lambda: True)
    cell = nn.LSTMCell(4, 3)
    params = cell.init(jax.random.PRNGKey(6))
    inputs = jnp.asarray(RNG.randn(2, 5, 4), jnp.float32)
    mask = _mask(2, 5, [5, 3])
    out_ref, fin_ref = rnn_mod.unidirectional_rnn(
        cell, params, inputs, mask, allow_pallas=False)
    out_pal, fin_pal = rnn_mod.unidirectional_rnn(
        cell, params, inputs, mask, allow_pallas=True)
    np.testing.assert_allclose(np.asarray(out_pal),
                               np.asarray(out_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin_pal),
                               np.asarray(fin_ref), atol=1e-5)
