"""Headline benchmark: decoded sentences/sec/chip at beam=10.

Measures the BASELINE.json north-star metric on a production-shaped MT
model (30k vocab, 512-dim embeddings, 512-unit BiGRU encoder + Bahdanau
attention decoder). The TPU path runs the whole beam search as one
jitted ``lax.while_loop`` on device; the baseline denominator is a
faithful emulation of the reference's Python beam-search runner
(nm/runners/beam_search_runner.py semantics: one device call per decode
step, top-k + beam reordering on the host) executed on this host's CPU,
since the TF1 reference itself cannot run here (SURVEY.md §0, §7).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from functools import partial

import numpy as np

# model / workload shape (overridable for smoke tests)
VOCAB = int(os.environ.get("BENCH_VOCAB", 30000))
EMB = int(os.environ.get("BENCH_EMB", 512))
RNN = int(os.environ.get("BENCH_RNN", 512))
BATCH = int(os.environ.get("BENCH_BATCH", 64))
SRC_LEN = int(os.environ.get("BENCH_SRC_LEN", 32))
BEAM = int(os.environ.get("BENCH_BEAM", 10))
MAX_OUT = int(os.environ.get("BENCH_MAX_OUT", 48))
TPU_REPEATS = int(os.environ.get("BENCH_REPEATS", 12))
SPREAD_N = int(os.environ.get("BENCH_SPREAD_N", 3))
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", 8))
# transformer shape (production default; overridable for smoke tests)
T_DIM = int(os.environ.get("BENCH_T_DIM", 512))
T_FF = int(os.environ.get("BENCH_T_FF", 2048))
T_DEPTH = int(os.environ.get("BENCH_T_DEPTH", 6))
T_HEADS = int(os.environ.get("BENCH_T_HEADS", 8))
# fallback matmul ceiling of THIS tunneled chip (the round-2 ~34 TF
# f32-as-bf16 measurement on isolated 4096^3 matmuls) — the bench
# re-measures at run time (measure_matmul_ceiling) because the model
# steps themselves sustain ~37 TF/s, proving the old number was an
# underestimate; BENCH_TFLOPS_CEILING overrides both
_TFLOPS_FALLBACK = 34e12


def _enable_compile_cache() -> None:
    """Point JAX at the product's persistent compilation cache so
    repeat bench runs re-serve compiles from disk instead of paying
    tens of seconds (minutes for Mosaic kernels) per model variant.
    Timing windows always run AFTER a warm transfer, so the cache
    affects wall-clock setup only, never a measured number."""
    try:
        from neuralmonkey_tpu.utils.compilation_cache import \
            enable_compilation_cache
        enable_compilation_cache()
    except Exception as exc:  # bench must run even if the cache can't
        print(f"bench: compile cache unavailable: {exc}",
              file=sys.stderr)


def _wait_for_device() -> None:
    """The tunneled backend can WEDGE — every jit (even a 128x128
    matmul) hangs — after a client dies mid-remote-compile, and the
    outage can last hours (CLAUDE.md). A wedged relay would make the
    whole bench hang with no diagnostic, so probe with a BOUNDED
    subprocess jit first and retry on a timer: a transient outage
    delays the run instead of silently eating it. BENCH_PROBE_WAIT
    caps the total wait (seconds; default 30 min; 0 skips)."""
    import subprocess
    budget = float(os.environ.get("BENCH_PROBE_WAIT", 1800))
    if budget <= 0:
        return
    deadline = time.time() + budget
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jax.jit(lambda a: (a @ a).sum())"
             "(jnp.ones((128, 128)))))")
    # LONG per-attempt timeout on purpose: killing a probe that is
    # merely queued behind someone's multi-minute Mosaic compile is
    # itself the kill-mid-remote-compile pattern that wedges the
    # helper (CLAUDE.md). 600 s covers a cold helper; only a truly
    # wedged relay exhausts it. Attempts repeat within the budget.
    attempt_s = min(600.0, budget)
    while True:
        try:
            subprocess.run([sys.executable, "-c", probe],
                           timeout=attempt_s, check=True,
                           capture_output=True)
            return
        except subprocess.TimeoutExpired:
            if time.time() + attempt_s > deadline:
                print("bench: device probe still hanging after "
                      f"{budget:.0f}s; proceeding anyway",
                      file=sys.stderr)
                return
            print(f"bench: device probe hung {attempt_s:.0f}s "
                  "(wedged relay?); retrying", file=sys.stderr)
        except subprocess.CalledProcessError as exc:
            tail = (exc.stderr or b"")[-300:].decode(errors="replace")
            print(f"bench: device probe errored (not a hang): {tail}",
                  file=sys.stderr)
            return  # let the real run surface the error


def measure_matmul_ceiling_spread(n_windows: int = 5) -> dict:
    """Peak sustained matmul FLOP/s on this chip, measured with the
    models' own semantics (f32 operands, default precision = one bf16
    MXU pass with f32 accumulation). Protocol per CLAUDE.md: the
    matmul chain loops ON DEVICE inside one jit (lax.scan with a
    value-feedback carry so XLA cannot elide iterations) and syncs
    once via a host transfer.

    Median over ``n_windows`` repeats with min/max recorded (VERDICT
    r4 item 5: a single ceiling measurement swung ±11% across rounds,
    turning every cross-round MFU delta into denominator noise)."""
    env = os.environ.get("BENCH_TFLOPS_CEILING")
    if env:
        v = float(env)
        return {"value": v, "min": v, "max": v, "n": 1,
                "source": "BENCH_TFLOPS_CEILING"}
    import jax
    import jax.numpy as jnp
    n, iters = 4096, 24

    @jax.jit
    def chain(x, w):
        def body(c, _):
            # feedback keeps every iteration data-dependent
            return jnp.dot(c, w), ()
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y[:8, :8]

    x = jnp.eye(n, dtype=jnp.float32)  # identity: no overflow growth
    w = jnp.eye(n, dtype=jnp.float32) * 1.0001
    _ = np.asarray(chain(x, w))        # compile + warm

    def window() -> float:
        start = time.perf_counter()
        _ = np.asarray(chain(x, w))
        elapsed = time.perf_counter() - start
        # no floor-clamp here: the spread exists to EXPOSE a degraded
        # or contended chip, and clamping every window to the fallback
        # would report a flat 34 TF/s instead (the fallback is only
        # used when the measurement itself raises)
        return 2.0 * n ** 3 * iters / elapsed

    return _spread(window, n=n_windows, digits=-1)


def measure_matmul_ceiling() -> float:
    """Median ceiling (see measure_matmul_ceiling_spread)."""
    return measure_matmul_ceiling_spread()["value"]


def measure_shape_matched_ceiling(n_windows: int = 3) -> dict:
    """Sustained TF/s on the TRAIN STEP'S OWN dominant GEMM shapes —
    the (B·T, E)x(E, V) logit projection class, (3072, 512)x(512,
    30720) at bench constants — so a ~0.5 train MFU can be attributed
    to shape-induced MXU granularity vs a lowering regression (VERDICT
    r4 item 5's optional shape-matched denominator). The chain
    alternates y = x·W and x = y·Wᵀ-shaped GEMMs with value feedback
    (same anti-elision protocol as the square ceiling)."""
    import jax
    import jax.numpy as jnp
    rows, d, v = BATCH * MAX_OUT, EMB, 30720
    iters = 12

    @jax.jit
    def chain(x, w1, w2):
        def body(c, _):
            y = jnp.dot(c, w1)          # (rows, d) x (d, v)
            return jnp.dot(y, w2) * 1e-2, ()  # (rows, v) x (v, d)
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y[:8, :8]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, d).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(d, v).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.randn(v, d).astype(np.float32) * 0.01)
    _ = np.asarray(chain(x, w1, w2))   # compile + warm
    flops = 2.0 * 2 * rows * d * v * iters

    def window() -> float:
        start = time.perf_counter()
        _ = np.asarray(chain(x, w1, w2))
        return flops / (time.perf_counter() - start)

    return _spread(window, n=n_windows, digits=-1)


def analytic_flops() -> dict:
    """Matmul-dominant analytic FLOPs for the four headline workloads,
    mechanizing docs/performance.md's derivation from the bench shape
    constants (VERDICT r2 item 3): 2·m·n·k per (m,k)x(k,n) matmul,
    summed over the model's mathematical formulation — independent of
    how XLA lowers it, so a lowering change that halves MXU
    utilization at unchanged analytic FLOPs shows up as a drop in
    achieved TFLOP/s. Elementwise/softmax/norm work is excluded (<~2%
    at these shapes) and causal attention is counted at its dense
    T^2 math, so MFU is approximate but stable. Backward = 2x forward
    (each forward matmul transposes into two)."""
    B, Ts, Tt = BATCH, SRC_LEN, MAX_OUT
    E, R, V, K = EMB, RNN, VOCAB, BEAM
    C = 2 * R                       # BiGRU context dim

    # --- RNN flagship: BiGRU encoder + conditional-GRU decoder ------
    enc_fwd = 2 * (2 * B * Ts * E * 3 * R     # input gates, both dirs
                   + 2 * B * Ts * R * 3 * R)  # recurrent gates
    keys_fwd = 2 * B * Ts * C * R             # Bahdanau key precompute

    def rnn_dec_step(rows):
        return (2 * rows * E * 3 * R          # cell1 input gates
                + 2 * rows * R * 3 * R        # cell1 recurrent
                + 2 * rows * C * 3 * R        # cell2 context input
                + 2 * rows * R * 3 * R        # cell2 recurrent
                + 2 * rows * R * R            # attention query proj
                + 2 * rows * Ts * R           # energies v-dot
                + 2 * rows * Ts * C           # context weighted sum
                + 2 * rows * (R + E + C) * 2 * E  # maxout prelogit
                + 2 * rows * E * V)           # logits
    rnn_fwd = enc_fwd + keys_fwd + Tt * rnn_dec_step(B)

    # --- Transformer 512d/2048ff/6+6L ------------------------------
    F, L = T_FF, T_DEPTH

    def t_enc_layer():
        return (4 * 2 * B * Ts * E * E        # q,k,v,o projections
                + 4 * B * Ts * Ts * E         # scores + context
                + 2 * 2 * B * Ts * E * F)     # FFN in+out

    def t_dec_layer():
        return (4 * 2 * B * Tt * E * E        # self q,k,v,o
                + 4 * B * Tt * Tt * E         # self attn (dense math)
                + 2 * 2 * B * Tt * E * E      # cross q,o
                + 2 * 2 * B * Ts * E * E      # cross k,v
                + 4 * B * Tt * Ts * E         # cross attn
                + 2 * 2 * B * Tt * E * F)     # FFN
    t_fwd = (L * t_enc_layer() + L * t_dec_layer()
             + 2 * B * Tt * E * V)            # logit projection

    # --- beam decode (B·K rows, incremental caches) -----------------
    rows = B * K
    rnn_decode = enc_fwd + keys_fwd + Tt * rnn_dec_step(rows)
    tri = Tt * (Tt + 1) // 2                  # growing self-att cache
    t_steps = (L * (4 * 2 * rows * E * E * Tt  # self q,k,v,o per token
                    + 4 * rows * E * tri       # self attn vs cache
                    + 2 * 2 * rows * E * E * Tt  # cross q,o
                    + 4 * rows * Ts * E * Tt     # cross attn
                    + 2 * 2 * rows * E * F * Tt)  # FFN
               + 2 * rows * E * V * Tt)           # logits
    t_decode = (L * t_enc_layer()                 # encoder, batch B
                + L * 2 * 2 * B * Ts * E * E      # cross k/v, shared
                + t_steps)

    return {"rnn_train_step": 3 * rnn_fwd,
            "transformer_train_step": 3 * t_fwd,
            "rnn_decode_batch": rnn_decode,
            "transformer_decode_batch": t_decode}


def build(batch_size: int):
    import jax
    import jax.numpy as jnp
    from neuralmonkey_tpu.vocabulary import Vocabulary
    from neuralmonkey_tpu.models.encoders.recurrent import SentenceEncoder
    from neuralmonkey_tpu.models.attention.feed_forward import Attention
    from neuralmonkey_tpu.models.decoders.decoder import Decoder
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)

    vs, vt = Vocabulary(), Vocabulary()
    # vocabulary objects only size the embedding tables here
    for v in (vs, vt):
        v.index_to_word = v.index_to_word + [
            f"w{i}" for i in range(VOCAB - 4)]
        v.word_to_index = {t: i for i, t in enumerate(v.index_to_word)}

    class FullLengthDecoder(Decoder):
        """Bench-only: forbid </s> so every sentence decodes the full
        MAX_OUT steps — random params would otherwise end sentences
        after ~2 steps and make throughput meaningless. Applied to the
        TPU and CPU-baseline paths alike."""

        def decode_step(self, constants, loop_state, prev_ids, step):
            new_state, logits, aux = super().decode_step(
                constants, loop_state, prev_ids, step)
            logits = logits.at[..., 2].set(-1e9)  # END_TOKEN_INDEX
            return new_state, logits, aux

        def decode_step_lineage(self, constants, loop_state, prev_ids,
                                step, anc, beam, window=None):
            # the (default) lineage path does NOT route through
            # decode_step — mask EOS here too or tiny-vocab runs
            # finish early and overstate throughput
            new_state, logits, aux = super().decode_step_lineage(
                constants, loop_state, prev_ids, step, anc, beam,
                window=window)
            logits = logits.at[..., 2].set(-1e9)
            return new_state, logits, aux

    enc = SentenceEncoder(name="encoder", vocabulary=vs,
                          data_id="source", embedding_size=EMB,
                          rnn_size=RNN)
    att = Attention(name="attention", encoder=enc, state_size=RNN)
    dec = FullLengthDecoder(
        name="decoder", vocabulary=vt, data_id="target",
        max_output_len=MAX_OUT, rnn_size=RNN, encoders=[enc],
        attentions=[att], embedding_size=EMB, conditional_gru=True)
    bs = BeamSearchDecoder(name="bs", parent_decoder=dec,
                           beam_size=BEAM, length_normalization=0.6)
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batch = {
        "encoder_input.ids": jnp.asarray(
            rng.randint(4, VOCAB, size=(batch_size, SRC_LEN)),
            jnp.int32),
        "encoder_input.mask": jnp.ones((batch_size, SRC_LEN),
                                       jnp.float32),
    }
    return enc, dec, bs, params, batch, Context


def verify_kernels_on_device() -> None:
    """Assert every Pallas kernel matches its pure-JAX twin ON THE
    REAL BACKEND (golden tests cover the CPU interpreter only; Mosaic
    numerics are asserted here, at bench time)."""
    import jax
    import jax.numpy as jnp
    from neuralmonkey_tpu.ops.kernel_config import use_pallas
    if not use_pallas():
        print("kernel check: Pallas unavailable, skipped",
              file=sys.stderr)
        return
    rng = np.random.RandomState(7)

    from neuralmonkey_tpu.ops import beam_select
    x = jnp.asarray(rng.randn(64, 1920).astype(np.float32) * 4)
    rm_p, lse_p = jax.jit(beam_select._rowmax_lse_pallas)(x)
    rm_r, lse_r = jax.jit(beam_select._rowmax_lse_reference)(x)
    np.testing.assert_allclose(np.asarray(rm_p), np.asarray(rm_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_r),
                               rtol=1e-4)
    print("kernel check: beam_select.rowmax_lse OK", file=sys.stderr)

    # fused logit projection + selection reductions (one HBM pass)
    fx = jnp.asarray(rng.randn(64, 512).astype(np.float32))
    fw = jnp.asarray(rng.randn(512, 1920).astype(np.float32) * 0.1)
    fb = jnp.asarray(rng.randn(1, 1920).astype(np.float32))
    tiling = beam_select._fused_tiling(64, 512, 1920)
    got = jax.jit(partial(beam_select._fused_pallas,
                          tiling=tiling))(fx, fw, fb)
    want = jax.jit(
        beam_select._fused_logits_rowmax_lse_reference)(fx, fw, fb)
    for name, g, r in zip(("logits", "rowmax", "lse"), got, want):
        g, r = np.asarray(g), np.asarray(r)
        scale = max(float(np.max(np.abs(r))), 1e-6)
        max_dev = float(np.max(np.abs(g - r))) / scale
        assert max_dev < 1e-2, (
            f"fused_logits {name} deviates {max_dev:.2%} on the real "
            "lowering")
    print("kernel check: beam_select.fused_logits_rowmax_lse OK",
          file=sys.stderr)

    xt = jnp.round(jnp.asarray(rng.randn(64, 2350).astype(np.float32)
                               * 3))  # ties included
    v_p, i_p = jax.jit(lambda a: beam_select._topk_pallas(a, 10))(xt)
    v_r, i_r = jax.jit(lambda a: beam_select._topk_reference(a, 10))(xt)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_r))
    print("kernel check: beam_select.small_topk OK", file=sys.stderr)

    # streaming GRU scan + its hand-written BPTT kernel: values AND
    # gradients against the XLA scan, on the real Mosaic lowering
    from neuralmonkey_tpu.ops import nn as nn_ops
    from neuralmonkey_tpu.ops.rnn import unidirectional_rnn
    cell = nn_ops.GRUCell(128, 128)
    params = cell.init(jax.random.PRNGKey(3))
    gx = jnp.asarray(rng.randn(16, 24, 128).astype(np.float32))
    gm = jnp.ones((16, 24), jnp.float32)

    def scan_loss(p, pallas):
        out, fin = unidirectional_rnn(cell, p, gx, gm,
                                      allow_pallas=pallas)
        return jnp.sum(out * out) + jnp.sum(jnp.tanh(fin))

    g_ref = jax.jit(jax.grad(lambda p: scan_loss(p, False)))(params)
    g_pal = jax.jit(jax.grad(lambda p: scan_loss(p, True)))(params)
    for key in g_ref:
        ref, pal = np.asarray(g_ref[key]), np.asarray(g_pal[key])
        # Mosaic transcendentals differ from XLA by ~1e-3 relative and
        # the divergence compounds through the 24-step BPTT; this
        # check exists to catch GROSS lowering faults, so compare
        # normalized: no element may deviate by >3% of the grad scale
        scale = max(float(np.max(np.abs(ref))), 1e-6)
        max_dev = float(np.max(np.abs(pal - ref))) / scale
        assert max_dev < 3e-2, (
            f"gru_scan BPTT grad '{key}' deviates {max_dev:.2%} "
            "of grad scale on the real lowering")
    print("kernel check: pallas_rnn.gru_scan fwd+BPTT OK",
          file=sys.stderr)

    lstm = nn_ops.LSTMCell(128, 128)
    lparams = lstm.init(jax.random.PRNGKey(5))

    def lstm_loss(p, pallas):
        out, fin = unidirectional_rnn(lstm, p, gx, gm,
                                      allow_pallas=pallas)
        return jnp.sum(out * out) + jnp.sum(jnp.tanh(fin))

    gl_ref = jax.jit(jax.grad(lambda p: lstm_loss(p, False)))(lparams)
    gl_pal = jax.jit(jax.grad(lambda p: lstm_loss(p, True)))(lparams)
    for key in gl_ref:
        ref, pal = np.asarray(gl_ref[key]), np.asarray(gl_pal[key])
        scale = max(float(np.max(np.abs(ref))), 1e-6)
        max_dev = float(np.max(np.abs(pal - ref))) / scale
        assert max_dev < 3e-2, (
            f"lstm_scan BPTT grad '{key}' deviates {max_dev:.2%} "
            "of grad scale on the real lowering")
    print("kernel check: pallas_rnn.lstm_scan fwd+BPTT OK",
          file=sys.stderr)

    # flash-attention backward kernels (dq, dk/dv) vs XLA through the
    # pure-JAX reference — asserted on the real Mosaic lowering
    from neuralmonkey_tpu.ops.pallas_attention import (_reference_flash,
                                                       flash_attention)
    fq = jnp.asarray(rng.randn(2, 4, 64, 64).astype(np.float32))
    fk = jnp.asarray(rng.randn(2, 4, 64, 64).astype(np.float32))
    fv = jnp.asarray(rng.randn(2, 4, 64, 64).astype(np.float32))
    fm = np.ones((2, 64), np.float32)
    fm[1, 50:] = 0.0
    fm = jnp.asarray(fm)
    fcot = jnp.asarray(rng.randn(2, 4, 64, 64).astype(np.float32))
    fg_pal = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
        flash_attention(a, b, c, fm) * fcot),
        argnums=(0, 1, 2)))(fq, fk, fv)
    fg_ref = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
        _reference_flash(a, b, c, fm, False) * fcot),
        argnums=(0, 1, 2)))(fq, fk, fv)
    for name, a, b in zip("qkv", fg_pal, fg_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(b))), 1e-6)
        max_dev = float(np.max(np.abs(a - b))) / scale
        assert max_dev < 3e-2, (
            f"flash backward d{name} deviates {max_dev:.2%} "
            "of grad scale on the real lowering")
    print("kernel check: flash_attention fwd+bwd OK", file=sys.stderr)

    # in-kernel attention dropout: the hash-based keep mask must be
    # BIT-identical between the kernel and the dense twin on the real
    # lowering (uniform-weights probe: k=0 makes every score exactly
    # 0, exp exact, so any diff can only come from a flipped keep bit
    # — one flip would show as ~|v|/(kp·T) ≈ 8e-3)
    from neuralmonkey_tpu.ops.pallas_attention import rng_to_key_words
    dkey = rng_to_key_words(jax.random.PRNGKey(5))
    kzero = jnp.zeros_like(fk)
    # full mask for the bit-identity probe: ragged rows carry a known
    # ~5e-4 masked-position transcendental artifact even WITHOUT
    # dropout (exp(-1e9) on Mosaic), which would drown the signal
    fm_full = jnp.ones_like(fm)
    d_out = jax.jit(lambda v: flash_attention(
        fq, kzero, v, fm_full, False, 128, 128, dkey, 0.8))(fv)
    d_ref = jax.jit(lambda v: _reference_flash(
        fq, kzero, v, fm_full, False, dkey, 0.8))(fv)
    bitdev = float(np.max(np.abs(np.asarray(d_out) - np.asarray(d_ref))))
    assert bitdev < 1e-5, (
        f"flash dropout keep mask differs on device (max {bitdev})")
    # dropout grads through the Pallas backward kernels
    env_bwd = os.environ.get("NM_FLASH_BWD")
    os.environ["NM_FLASH_BWD"] = "1"
    try:
        dg_pal = jax.jit(jax.grad(lambda a: jnp.sum(flash_attention(
            a, fk, fv, fm, False, 128, 128, dkey, 0.8) * fcot)))(fq)
        dg_ref = jax.jit(jax.grad(lambda a: jnp.sum(_reference_flash(
            a, fk, fv, fm, False, dkey, 0.8) * fcot)))(fq)
    finally:
        if env_bwd is None:
            del os.environ["NM_FLASH_BWD"]
        else:
            os.environ["NM_FLASH_BWD"] = env_bwd
    a, b = np.asarray(dg_pal), np.asarray(dg_ref)
    scale = max(float(np.max(np.abs(b))), 1e-6)
    assert float(np.max(np.abs(a - b))) / scale < 3e-2, \
        "flash dropout backward deviates on the real lowering"
    print("kernel check: flash_attention in-kernel dropout OK",
          file=sys.stderr)

    # fused softmax-xent training tail (fwd nll + dx/dw/db custom VJP)
    # vs the materialized-logits reference on the real lowering
    from neuralmonkey_tpu.ops import fused_xent
    xn, xd, xv = 256, 128, 1000          # non-lane-aligned V (pads)
    xx = jnp.asarray(rng.randn(xn, xd).astype(np.float32) * 0.3)
    xw = jnp.asarray(rng.randn(xv, xd).astype(np.float32) * 0.05)
    xb = jnp.asarray(rng.randn(xv).astype(np.float32) * 0.1)
    xt = jnp.asarray(rng.randint(0, xv, size=(xn,)), jnp.int32)

    def _xent_sum(fn):
        return jax.jit(jax.value_and_grad(
            lambda x, w, b: jnp.sum(fn(x, w, b)), argnums=(0, 1, 2)))

    xtiling = fused_xent._tiling(xn, xd, fused_xent.vp_pad(xv, 128))
    assert xtiling is not None
    got_v, got_g = _xent_sum(lambda x, w, b: fused_xent._fused(
        x, w, b, xt, 0.1, xv, xtiling, True))(xx, xw, xb)
    want_v, want_g = _xent_sum(lambda x, w, b: fused_xent.xent_reference(
        x, w, b, xt, 0.1, True))(xx, xw, xb)
    assert abs(float(got_v) - float(want_v)) / abs(float(want_v)) < 1e-3, \
        "fused xent nll deviates on the real lowering"
    for name, a, b in zip(("dx", "dw", "db"), got_g, want_g):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(b))), 1e-6)
        max_dev = float(np.max(np.abs(a - b))) / scale
        assert max_dev < 1e-2, (
            f"fused xent {name} deviates {max_dev:.2%} on the real "
            "lowering")
    print("kernel check: fused_xent fwd+VJP OK", file=sys.stderr)


def _spread(run_window, n: int = None, digits: int = 2) -> dict:
    """Median/min/max over ``n`` in-process repeats of one timing
    window (VERDICT r3 weak #2: a single run through the tunnel
    varies ±8%; the artifact now carries the spread so the headline
    is a median and the noise band is visible)."""
    n = SPREAD_N if n is None else n
    vals = sorted(run_window() for _ in range(n))
    return {"value": round(vals[n // 2], digits),
            "min": round(vals[0], digits),
            "max": round(vals[-1], digits),
            "n": n}


def _decode_window(search, dec, params, batch) -> float:
    """One timed decode window: TPU_REPEATS batches, host transfer +
    ids→tokens postprocessing kept in the measured time (BASELINE.md
    protocol) but pipelined one batch deep behind the NEXT batch's
    device decode — the same pipeline the runtime's execute() uses."""
    start = time.perf_counter()
    total = 0
    pending = None
    for _ in range(TPU_REPEATS):
        ids = search(params, batch)  # async dispatch
        if pending is not None:
            arr = np.asarray(pending)
            _ = dec.vocabulary.vectors_to_sentences(arr[:, 0, :])
            total += BATCH
        pending = ids
    arr = np.asarray(pending)
    _ = dec.vocabulary.vectors_to_sentences(arr[:, 0, :])
    total += BATCH
    return total / (time.perf_counter() - start)


def tpu_throughput() -> dict:
    """Whole search jitted on device; spread over SPREAD_N windows."""
    import jax
    enc, dec, bs, params, batch, Context = build(BATCH)

    @jax.jit
    def search(p, b):
        return bs.search(Context(p, b, train=False)).token_ids

    # Warm up twice with a full host transfer: on the axon backend
    # block_until_ready does NOT cover the lazy remote compile — only an
    # actual device->host copy guarantees the program ran.
    for _ in range(2):
        _ = np.asarray(search(params, batch))

    return _spread(lambda: _decode_window(search, dec, params, batch))


def _decode_variant(beam: int = None, src_len: int = None,
                    transformer: bool = False,
                    spread_n: int = 2, repeats: int = 6) -> dict:
    """Short-window decode rate at a non-default beam width / source
    length (VERDICT r4 item 6: the round-3 beam-20 win and the round-5
    long-source rows existed only as one-off BASELINE.md prose — these
    put them in the default artifact so the driver's BENCH_r* trail
    regression-guards them). The workload-shape globals are module
    constants read by build()/_decode_window at call time, so they are
    swapped for the measurement and restored."""
    global BEAM, SRC_LEN, TPU_REPEATS
    saved = (BEAM, SRC_LEN, TPU_REPEATS)
    BEAM = beam if beam is not None else saved[0]
    SRC_LEN = src_len if src_len is not None else saved[1]
    TPU_REPEATS = repeats
    try:
        import jax
        builder = build_transformer if transformer else build
        enc, dec, bs, params, batch, Context = builder(BATCH)

        @jax.jit
        def search(p, b):
            return bs.search(Context(p, b, train=False)).token_ids

        for _ in range(2):
            _ = np.asarray(search(params, batch))
        return _spread(
            lambda: _decode_window(search, dec, params, batch),
            n=spread_n)
    finally:
        BEAM, SRC_LEN, TPU_REPEATS = saved


def cpu_reference_throughput() -> float:
    """Reference emulation: per-step device call, host-side beam logic.

    Mirrors SURVEY.md §4.4: every decode step crosses the host↔device
    boundary; top-k selection and SearchState reordering happen in
    numpy on the host, exactly like the reference runner."""
    import jax
    import jax.numpy as jnp
    enc, dec, bs, params, batch, Context = build(CPU_BATCH)

    ctx = Context(params, batch, train=False)
    constants = jax.jit(
        lambda p, b: dec.decode_constants(
            Context(p, b, train=False)))(params, batch)
    init_state = jax.jit(
        lambda p, b: dec.decode_initial_state(
            Context(p, b, train=False),
            dec.decode_constants(Context(p, b, train=False)))
    )(params, batch)

    tiled_constants = dec.tile_decode_constants(constants, BEAM)
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, BEAM, axis=0), init_state)

    @jax.jit
    def step_fn(state, prev_ids):
        new_state, logits, _ = dec.decode_step(
            tiled_constants, state, prev_ids, 0)
        return new_state, jax.nn.log_softmax(logits, axis=-1)

    # python-side beam state (the reference's SearchState)
    B = CPU_BATCH
    logprob = np.full((B, BEAM), -1e9)
    logprob[:, 0] = 0.0
    lengths = np.zeros((B, BEAM), np.int64)
    finished = np.zeros((B, BEAM), bool)
    tokens_hist = np.zeros((B, BEAM, MAX_OUT), np.int64)
    prev = np.full((B * BEAM,), 1, np.int64)  # <s>

    start = time.perf_counter()
    for t in range(MAX_OUT):
        state, logprobs_dev = step_fn(state, jnp.asarray(prev))
        lp = np.array(logprobs_dev).reshape(B, BEAM, VOCAB)  # host copy
        lp[finished] = -1e9
        lp[finished, 0] = 0.0
        total = logprob[..., None] + lp
        new_len = lengths + (~finished).astype(np.int64)
        penal = ((5.0 + new_len) / 6.0) ** 0.6
        normed = (total / penal[..., None]).reshape(B, BEAM * VOCAB)
        top_idx = np.argsort(-normed, axis=1)[:, :BEAM]
        parents = top_idx // VOCAB
        toks = top_idx % VOCAB
        # reorder host state
        bidx = np.arange(B)[:, None]
        logprob = np.take_along_axis(
            total.reshape(B, BEAM * VOCAB), top_idx, axis=1)
        old_fin = finished[bidx, parents]
        lengths = lengths[bidx, parents] + (~old_fin).astype(np.int64)
        tokens_hist = tokens_hist[bidx, parents]
        emit = np.where(old_fin, 0, toks)
        tokens_hist[:, :, t] = emit
        finished = old_fin | (emit == 2)
        # reorder device state (gather on device, like the reference's
        # feed of reordered beam state)
        flat = (parents + np.arange(B)[:, None] * BEAM).reshape(-1)
        state = jax.tree_util.tree_map(
            lambda x: jnp.take(x, jnp.asarray(flat), axis=0), state)
        prev = emit.reshape(-1)
        if finished.all():
            break
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start
    _ = dec.vocabulary.vectors_to_sentences(tokens_hist[:, 0, :])
    return B / elapsed


def build_transformer(batch_size: int):
    """Production-shaped Transformer (milestone 3): 512d/2048ff/6+6
    layers, 8 heads, 30k vocab."""
    import jax
    import jax.numpy as jnp
    from neuralmonkey_tpu.model.part import (Context, collect_parts,
                                             init_all_params)
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.models.decoders.transformer import \
        TransformerDecoder
    from neuralmonkey_tpu.models.encoders.transformer import \
        TransformerEncoder
    from neuralmonkey_tpu.vocabulary import Vocabulary

    vs, vt = Vocabulary(), Vocabulary()
    for v in (vs, vt):
        v.index_to_word = v.index_to_word + [
            f"w{i}" for i in range(VOCAB - 4)]
        v.word_to_index = {t: i for i, t in enumerate(v.index_to_word)}
    class FullLengthTransformerDecoder(TransformerDecoder):
        """Bench-only: forbid </s> on both decode paths so every
        sentence runs the full MAX_OUT steps (see FullLengthDecoder)."""

        def decode_step(self, constants, loop_state, prev_ids, step):
            new_state, logits, aux = super().decode_step(
                constants, loop_state, prev_ids, step)
            logits = logits.at[..., 2].set(-1e9)  # END_TOKEN_INDEX
            return new_state, logits, aux

        def decode_step_lineage(self, constants, loop_state, prev_ids,
                                step, anc, beam, window=None):
            new_state, logits, aux = super().decode_step_lineage(
                constants, loop_state, prev_ids, step, anc, beam,
                window=window)
            logits = logits.at[..., 2].set(-1e9)
            return new_state, logits, aux

    remat = bool(int(os.environ.get("BENCH_REMAT", "0")))
    # BENCH_MOE_EXPERTS=E turns every FFN into an E-expert MoE
    # (ops/moe.py) for MoE train/decode throughput rows
    moe = int(os.environ.get("BENCH_MOE_EXPERTS", "0"))
    enc = TransformerEncoder(
        name="tenc", vocabulary=vs, data_id="source",
        embedding_size=T_DIM, ff_hidden_size=T_FF, depth=T_DEPTH,
        n_heads=T_HEADS, remat=remat, moe_experts=moe)
    dec = FullLengthTransformerDecoder(
        name="tdec", vocabulary=vt, data_id="target",
        encoders=[enc], embedding_size=T_DIM, ff_hidden_size=T_FF,
        depth=T_DEPTH, n_heads_self=T_HEADS, n_heads_enc=T_HEADS,
        max_output_len=MAX_OUT, label_smoothing=0.1, remat=remat,
        moe_experts=moe)
    bs = BeamSearchDecoder(name="tbs", parent_decoder=dec,
                           beam_size=BEAM, length_normalization=0.6)
    parts = collect_parts([dec])
    params = init_all_params(parts, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "tenc_input.ids": jnp.asarray(
            rng.randint(4, VOCAB, size=(batch_size, SRC_LEN)),
            jnp.int32),
        "tenc_input.mask": jnp.ones((batch_size, SRC_LEN),
                                    jnp.float32),
    }
    return enc, dec, bs, params, batch, Context


def train_throughput(model: str = "rnn") -> dict:
    """Training target-tokens/sec on the production-shaped model."""
    import jax
    import jax.numpy as jnp
    import optax
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer

    if model == "transformer":
        enc, dec, _, params, batch, Context = build_transformer(BATCH)
    else:
        enc, dec, _, params, batch, Context = build(BATCH)
    rng = np.random.RandomState(1)
    tgt = rng.randint(4, VOCAB, size=(BATCH, MAX_OUT)).astype(np.int32)
    batch = dict(batch)
    batch[dec.input_ids_key] = jnp.asarray(tgt)
    batch[dec.target_ids_key] = jnp.asarray(tgt)
    batch[dec.target_mask_key] = jnp.ones((BATCH, MAX_OUT), jnp.float32)

    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-4))
    tx = trainer.make_optax()

    # donate params/opt_state like the product train path
    # (runtime.py jits with donate_argnums=(0, 1))
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            return trainer.total_loss(p, batch, rng)
        (total, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, total

    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        params, opt_state, total = step(params, opt_state, batch, key)
        _ = float(total)
    steps = max(TPU_REPEATS * 2, 10)
    state = [params, opt_state]  # donated buffers persist per window

    def window() -> float:
        start = time.perf_counter()
        for _ in range(steps):
            state[0], state[1], total = step(
                state[0], state[1], batch, key)
        _ = float(total)  # device sync via host transfer
        elapsed = time.perf_counter() - start
        return BATCH * MAX_OUT * steps / elapsed

    spread = _spread(window, digits=1)
    return {"tokens_per_sec": spread["value"],
            "spread": spread,
            "examples_per_sec": spread["value"] / MAX_OUT,
            "step_ms": BATCH * MAX_OUT / spread["value"] * 1000}


def transformer_decode_throughput() -> dict:
    """Beam-10 transformer decode; spread over SPREAD_N windows."""
    import jax
    enc, dec, bs, params, batch, Context = build_transformer(BATCH)

    @jax.jit
    def search(p, b):
        return bs.search(Context(p, b, train=False)).token_ids

    for _ in range(2):
        _ = np.asarray(search(params, batch))
    return _spread(lambda: _decode_window(search, dec, params, batch))


def lineage_flip_rate(model: str = "rnn") -> float:
    """Fraction of rank-0 hypotheses that differ between lineage and
    physical beam decoding on one batch (VERDICT r1 item 9: the ~6e-4
    TPU logit reassociation noise can flip near-tie hypotheses; this
    measures how often, at production shapes, on the real backend)."""
    import jax
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    if model == "transformer":
        enc, dec, _, params, batch, Context = build_transformer(BATCH)
    else:
        enc, dec, _, params, batch, Context = build(BATCH)
    rates = {}
    for mode in ("on", "off"):
        bs = BeamSearchDecoder(name=f"fl_{mode}", parent_decoder=dec,
                               beam_size=BEAM, length_normalization=0.6,
                               lineage=mode)
        ids = jax.jit(
            lambda p, b, bs=bs:
            bs.search(Context(p, b, train=False)).token_ids
        )(params, batch)
        rates[mode] = np.asarray(ids)[:, 0, :]
    flips = np.any(rates["on"] != rates["off"], axis=-1)
    return float(np.mean(flips))


def trained_flip_rate(model: str = "rnn", steps: int = 400) -> dict:
    """Lineage-vs-physical rank-0 disagreement with TRAINED weights at
    bench shapes (VERDICT r2 item 9: the random-weight rates — 18.75%
    RNN / 1.56% transformer — are a worst-case upper bound; this
    measures the rate a model with realistic logit margins actually
    shows).

    The task is a stochastic token mapping at full bench shapes:
    target[t] = map(source[t mod SRC_LEN]), but 25% of training
    positions are replaced by one of four systematic confusers, so the
    learned distribution keeps genuine near-competitors (~2 nats to
    the runner-up) instead of the deterministic task's one-hot logits
    — closer to real MT entropy than either extreme. Training runs a
    few hundred steps of the same jitted step train_throughput uses;
    flips are counted on a held-out batch decoded both ways."""
    import jax
    import jax.numpy as jnp
    import optax
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        BeamSearchDecoder
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer

    builder = build_transformer if model == "transformer" else build
    enc, dec, _, params, batch, Context = builder(BATCH)
    ids_key = next(k for k in batch if k.endswith(".ids"))
    mask_key = next(k for k in batch if k.endswith(".mask"))

    # source/target alphabet sizes (disjoint vocab regions)
    n_map = min(2000, (VOCAB - 4) // 2)
    src_lo, tgt_lo = 4, 4 + n_map
    pos = np.arange(MAX_OUT) % SRC_LEN

    def mapped(src: np.ndarray) -> np.ndarray:
        return (src - src_lo) * 7919 % n_map + tgt_lo

    rng_np = np.random.RandomState(3)

    def make_batch():
        src = rng_np.randint(
            src_lo, src_lo + n_map, size=(BATCH, SRC_LEN)) \
            .astype(np.int32)
        tgt = mapped(src)[:, pos]
        noisy = rng_np.rand(BATCH, MAX_OUT) < 0.25
        shift = rng_np.randint(1, 5, size=(BATCH, MAX_OUT))
        confuser = (tgt - tgt_lo + shift) % n_map + tgt_lo
        tgt = np.where(noisy, confuser, tgt).astype(np.int32)
        b = dict(batch)
        b[ids_key] = jnp.asarray(src)
        b[mask_key] = jnp.ones((BATCH, SRC_LEN), jnp.float32)
        b[dec.input_ids_key] = jnp.asarray(tgt)
        b[dec.target_ids_key] = jnp.asarray(tgt)
        b[dec.target_mask_key] = jnp.ones((BATCH, MAX_OUT),
                                          jnp.float32)
        return b

    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-3))
    tx = trainer.make_optax()

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b, rng):
        def loss_fn(p):
            return trainer.total_loss(p, b, rng)
        (total, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, total

    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)
    train_batches = [make_batch() for _ in range(16)]
    first = last = None
    for i in range(steps):
        params, opt_state, total = step(
            params, opt_state, train_batches[i % 16], key)
        if i == 0:
            first = float(total)
    last = float(total)

    held_out = make_batch()
    eval_batch = {ids_key: held_out[ids_key],
                  mask_key: held_out[mask_key]}
    rates = {}
    for mode in ("on", "off"):
        bs = BeamSearchDecoder(name=f"tfl_{mode}", parent_decoder=dec,
                               beam_size=BEAM,
                               length_normalization=0.6, lineage=mode)
        ids = jax.jit(
            lambda p, b, bs=bs:
            bs.search(Context(p, b, train=False)).token_ids
        )(params, eval_batch)
        rates[mode] = np.asarray(ids)[:, 0, :]
    flips = np.any(rates["on"] != rates["off"], axis=-1)
    return {"flip_rate": float(np.mean(flips)),
            "train_steps": steps,
            "first_loss": round(first, 3),
            "last_loss": round(last, 3)}


_DIGITS_EN = "zero one two three four five six seven eight nine".split()
_DIGITS_DE = "null eins zwei drei vier fünf sechs sieben acht neun".split()


def synthesize_digit_corpus(directory: str, n_sentences: int = 2000,
                            seed: int = 7):
    """Deterministic digit-word translation corpus (the transformer
    quality-gate task — tests/test_quality_gates.py imports this)."""
    import random
    rng = random.Random(seed)
    src = os.path.join(directory, "train.en")
    tgt = os.path.join(directory, "train.de")
    with open(src, "w") as f_src, open(tgt, "w") as f_tgt:
        for _ in range(n_sentences):
            ids = [rng.randrange(10) for _ in range(rng.randint(2, 10))]
            f_src.write(" ".join(_DIGITS_EN[i] for i in ids) + "\n")
            f_tgt.write(" ".join(_DIGITS_DE[i] for i in ids) + "\n")
    return src, tgt


def _quality_e2e_visual(model: str, root: str, data: str, out: str,
                        t0: float) -> dict:
    """Milestones 4-5 on the real chip (VERDICT r2 item 2): train the
    captioning / multimodal INIs through the product path and score
    absolute BLEU on train+val (the corpora encode the target text in
    the image features — tests/data/gen_multimodal.py — so these are
    convergence gates, not smoke tests)."""
    from neuralmonkey_tpu.dataset import load_dataset_from_files
    from neuralmonkey_tpu.evaluators.bleu import BLEU
    from neuralmonkey_tpu.experiment import Experiment
    from neuralmonkey_tpu.readers.numpy_reader import single_tensor

    if model == "captioning":
        config = os.path.join(root, "tests", "configs",
                              "captioning.ini")
        changes = [f'main.output="{out}/exp"', "main.epochs=12",
                   "main.validation_period=50000",
                   "main.logging_period=100",
                   "decoder.dropout_keep_prob=1.0"]
        series = "caption"
        train_kw = dict(
            s_feats=(os.path.join(data, "caption_feats.npy"),
                     single_tensor),
            s_caption=os.path.join(data, "captions_train.txt"))
        val_kw = dict(
            s_feats=(os.path.join(data, "caption_feats_val.npy"),
                     single_tensor),
            s_caption=os.path.join(data, "captions_val.txt"))
    else:
        config = os.path.join(root, "tests", "configs",
                              "hier_multimodal.ini")
        changes = [f'main.output="{out}/exp"', "main.epochs=10",
                   "main.validation_period=50000",
                   "main.logging_period=100",
                   "decoder.dropout_keep_prob=1.0",
                   "text_encoder.dropout_keep_prob=1.0"]
        series = "target"
        train_kw = dict(
            s_source=os.path.join(data, "mmt_src_train.txt"),
            s_target=os.path.join(data, "mmt_tgt_train.txt"),
            s_feats=(os.path.join(data, "mmt_feats_train.npy"),
                     single_tensor))
        val_kw = dict(
            s_source=os.path.join(data, "mmt_src_val.txt"),
            s_target=os.path.join(data, "mmt_tgt_val.txt"),
            s_feats=(os.path.join(data, "mmt_feats_val.npy"),
                     single_tensor))

    exp = Experiment(config, train_mode=True, config_changes=changes)
    exp.train()
    train_s = time.time() - t0

    def bleu(kw, limit=None):
        ds = load_dataset_from_files(name="q", **kw)
        _, outputs = exp.run_model(ds)
        refs = list(ds.get_series(series))
        n = limit or len(refs)
        return round(BLEU(outputs[series][:n], refs[:n]), 2)

    return {"train_greedy_bleu": bleu(train_kw, limit=100),
            "val_greedy_bleu": bleu(val_kw),
            "train_wall_s": round(train_s, 1),
            "total_wall_s": round(time.time() - t0, 1)}


def quality_e2e(model: str = "rnn") -> dict:
    """End-to-end convergence ON THE REAL CHIP: train the quality-gate
    configs (the same tests/configs INIs that tests/test_quality_gates.py
    converges on the CPU mesh) through the full product path —
    Experiment → training_loop → checkpoints → runners — and score
    absolute BLEU. Records the hardware-verified numbers for
    BASELINE.md."""
    import shutil
    import tempfile

    from neuralmonkey_tpu.dataset import load_dataset_from_files
    from neuralmonkey_tpu.evaluators.bleu import BLEU
    from neuralmonkey_tpu.experiment import Experiment

    root = os.path.dirname(os.path.abspath(__file__))
    data = os.path.join(root, "tests", "data")
    out = tempfile.mkdtemp(prefix="bench_quality_")
    t0 = time.time()
    if model in ("captioning", "multimodal"):
        try:
            return _quality_e2e_visual(model, root, data, out, t0)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    try:
        if model == "transformer":
            # synthesized corpus (the checked-in 300 sentences are too
            # small for the tiny transformer — see test_quality_gates)
            src, tgt = synthesize_digit_corpus(out)
            config = os.path.join(root, "tests", "configs",
                                  "transformer.ini")
            changes = [f'main.output="{out}/exp"', "main.epochs=14",
                       "main.validation_period=50000",
                       "main.logging_period=400",
                       f'train_data.s_source="{src}"',
                       f'train_data.s_target="{tgt}"']
        else:
            config = os.path.join(root, "tests", "configs",
                                  "beamsearch.ini")
            changes = [f'main.output="{out}/exp"', "main.epochs=20",
                       "main.validation_period=5000",
                       "main.logging_period=100"]
        changes += ["encoder.dropout_keep_prob=1.0",
                    "decoder.dropout_keep_prob=1.0"]
        exp = Experiment(config, train_mode=True, config_changes=changes)
        exp.train()
        train_s = time.time() - t0

        def bleu(src_path, ref_path, limit=None):
            if model == "transformer":
                from neuralmonkey_tpu.processors.bpe import \
                    BPEPreprocessor
                bpe = BPEPreprocessor(
                    merge_file=os.path.join(data, "merges.bpe"))
                ds = load_dataset_from_files(
                    name="q", s_source=src_path, s_target=ref_path,
                    preprocessors=[("source", "source_bpe", bpe),
                                   ("target", "target_bpe", bpe)])
                series_list = ("target",)
            else:
                ds = load_dataset_from_files(
                    name="q", s_source=src_path, s_target=ref_path)
                series_list = ("target", "target_beam")
            _, outputs = exp.run_model(ds)
            refs = list(ds.get_series("target"))
            n = limit or len(refs)
            return {series: round(BLEU(outputs[series][:n], refs[:n]), 2)
                    for series in series_list}

        if model == "transformer":
            train_scores = bleu(src, tgt, limit=100)
        else:
            train_scores = bleu(os.path.join(data, "train.en"),
                                os.path.join(data, "train.de"), limit=100)
        val_scores = bleu(os.path.join(data, "val.en"),
                          os.path.join(data, "val.de"))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    result = {
        "train_greedy_bleu": train_scores["target"],
        "val_greedy_bleu": val_scores["target"],
        "train_wall_s": round(train_s, 1),
        "total_wall_s": round(time.time() - t0, 1),
    }
    if "target_beam" in val_scores:
        result["train_beam10_bleu"] = train_scores["target_beam"]
        result["val_beam10_bleu"] = val_scores["target_beam"]
    return result


def serve_latency(model: str = "rnn", requests: int = 50) -> dict:
    """Online-serving latency: batch-1 end-to-end request time.

    The server path (server.py -> Experiment.run_model) decodes one
    sentence per request; this measures that round sequentially — no
    pipelining, latency not throughput: device decode + host transfer
    + ids->tokens postprocessing per request. Greedy and beam=10."""
    import jax
    builder = build_transformer if model == "transformer" else build
    enc, dec, bs, params, batch, Context = builder(1)

    greedy = jax.jit(
        lambda p, b: dec.decoded(Context(p, b, train=False)))
    beam = jax.jit(
        lambda p, b: bs.search(Context(p, b, train=False)).token_ids)

    # random weights never argmax to </s>, so the early-exit decode
    # loops run all MAX_OUT steps — the "full" rows (worst case). The
    # "floor" rows bias the </s> logit so every sentence finishes on
    # the first step: the request-overhead floor (dispatch + one
    # decode step + transfer + host postprocess) that the greedy
    # while_loop / beam all-finished exit reach on short sentences.
    import jax.numpy as jnp
    bias = np.zeros(VOCAB, np.float32)
    bias[2] = 1e4  # END token wins every argmax

    def eos_biased(p):
        part = dec.name if dec.name in p else "decoder"
        p = dict(p)
        p[part] = dict(p[part])
        if "logit" in p[part]:  # RNN decoder: logit/{w,b} projection
            p[part]["logit"] = dict(p[part]["logit"])
            p[part]["logit"]["b"] = (
                p[part]["logit"]["b"] + jnp.asarray(bias))
        else:  # transformer decoder: tied embeddings + logit_bias
            p[part]["logit_bias"] = (
                p[part]["logit_bias"] + jnp.asarray(bias))
        return p

    out = {}
    for label, fn, select in (
            ("greedy", greedy, lambda a: a),
            ("beam10", beam, lambda a: a[:, 0, :])):
        for plabel, p in (("full", params),
                          ("floor", eos_biased(params))):
            for _ in range(3):  # compile + warm (full host transfer)
                np.asarray(fn(p, batch))
            lats = []
            for _ in range(requests):
                start = time.perf_counter()
                arr = np.asarray(fn(p, batch))
                _ = dec.vocabulary.vectors_to_sentences(select(arr))
                lats.append((time.perf_counter() - start) * 1000)
            lats.sort()
            out[f"{label}_{plabel}"] = {
                "p50_ms": round(lats[len(lats) // 2], 2),
                "p99_ms": round(lats[min(len(lats) - 1,
                                         int(len(lats) * 0.99))], 2),
                "mean_ms": round(sum(lats) / len(lats), 2)}
    return out


def serve_concurrent(clients: int = 32, per_client: int = 5,
                     window_ms: float = 10.0) -> dict:
    """End-to-end HTTP serving throughput with dynamic micro-batching
    (VERDICT r2 item 8): boots the REAL server stack (ThreadingHTTPServer
    + ModelService + Experiment.run_model) and compares one sequential
    client against `clients` concurrent clients. Batch-1 requests are
    relay-round-trip-bound (~30-40 ms, BASELINE.md), so without request
    coalescing concurrent throughput would equal the single-client
    number; the micro-batcher merges concurrent bodies into one jitted
    decode per window."""
    import tempfile
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from neuralmonkey_tpu.experiment import Experiment
    from neuralmonkey_tpu.server import ModelService, make_handler

    root = os.path.dirname(os.path.abspath(__file__))
    config = os.path.join(root, "tests", "configs", "small.ini")
    out = tempfile.mkdtemp(prefix="nm_serve_bench_")
    exp = Experiment(config, train_mode=False,
                     config_changes=[f'main.output="{out}"'])
    cwd = os.getcwd()
    os.chdir(root)  # small.ini's data paths are repo-relative
    try:
        exp.build_model()  # random init — serving overhead, not quality
    finally:
        os.chdir(cwd)

    service = ModelService(exp, batch_window_ms=window_ms)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    digits = ("one two three", "nine eight seven", "five four",
              "two six", "seven one five four", "eight one three")

    def post(i: int) -> None:
        body = json.dumps({"source": [digits[i % len(digits)]]})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/run", data=body.encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            resp.read()

    try:
        for i in range(3):   # compile + warm every time bucket
            post(i)

        n_single = 40
        start = time.perf_counter()
        for i in range(n_single):
            post(i)
        single_rps = n_single / (time.perf_counter() - start)

        calls_before = service.stats["model_calls"]
        threads = [threading.Thread(
            target=lambda c=c: [post(c * per_client + j)
                                for j in range(per_client)])
            for c in range(clients)]
        start = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - start
        total = clients * per_client
        return {
            "single_client_rps": round(single_rps, 1),
            "concurrent_rps": round(total / elapsed, 1),
            "speedup": round(total / elapsed / single_rps, 2),
            "clients": clients,
            "requests": total,
            "model_calls": service.stats["model_calls"] - calls_before,
            "max_merged_requests":
                service.stats["max_merged_requests"],
            "batch_window_ms": window_ms,
        }
    finally:
        service.close()
        server.shutdown()


def main() -> None:
    _enable_compile_cache()
    _wait_for_device()
    if "--serve" in sys.argv:
        if "--concurrent" in sys.argv:
            print(json.dumps({
                "metric": "serve_concurrent_throughput",
                "value": serve_concurrent(),
                "unit": "requests/sec, HTTP end-to-end"}))
            return
        for model in ("rnn", "transformer"):
            print(json.dumps({
                "metric": f"{model}_serve_latency",
                "value": serve_latency(model),
                "unit": "ms/request, batch 1"}))
        return

    if "--quality" in sys.argv:
        import jax
        model = "rnn"
        for candidate in ("transformer", "captioning", "multimodal"):
            if f"--model={candidate}" in sys.argv:
                model = candidate
        result = quality_e2e(model)
        result.update({"metric": f"{model}_e2e_convergence_bleu",
                       "platform": jax.devices()[0].platform})
        print(json.dumps(result))
        return

    if "--cpu-baseline" in sys.argv:
        print(json.dumps({"cpu_sentences_per_sec":
                          cpu_reference_throughput()}))
        return

    if "--flip" in sys.argv:
        for model in ("rnn", "transformer"):
            print(json.dumps({
                "metric": f"{model}_lineage_flip_rate",
                "value": lineage_flip_rate(model),
                "unit": "fraction of sentences (random weights — "
                        "upper bound)"}))
            print(json.dumps({
                "metric": f"{model}_lineage_flip_rate_trained",
                "value": trained_flip_rate(model),
                "unit": "fraction of sentences (trained weights)"}))
        return

    if "--train" in sys.argv:
        model = ("transformer" if "--model=transformer" in sys.argv
                 else "rnn")
        for dtype in (None, "bfloat16"):
            from neuralmonkey_tpu.ops import policy
            policy.set_compute_dtype(dtype)
            result = train_throughput(model)
            print(json.dumps({
                "metric": f"{model}_train_tokens_per_sec",
                "compute_dtype": dtype or "float32",
                "value": round(result["tokens_per_sec"], 1),
                "unit": "target tokens/sec/chip",
                "spread": result["spread"],
                "step_ms": round(result["step_ms"], 2)}))
        return

    if "--transformer" in sys.argv:
        for dtype in (None, "bfloat16"):
            from neuralmonkey_tpu.ops import policy
            policy.set_compute_dtype(dtype)
            stats = transformer_decode_throughput()
            print(json.dumps({
                "metric": "transformer_beam10_sentences_per_sec",
                "compute_dtype": dtype or "float32",
                "value": stats["value"],
                "spread": stats,
                "unit": "sentences/sec/chip"}))
        return

    if "--bf16" in sys.argv:
        from neuralmonkey_tpu.ops import policy
        policy.set_compute_dtype("bfloat16")
        stats = tpu_throughput()
        print(json.dumps({
            "metric": "beam10_decoded_sentences_per_sec_per_chip",
            "compute_dtype": "bfloat16",
            "value": stats["value"],
            "spread": stats,
            "unit": "sentences/sec/chip"}))
        return

    # CPU baseline in a subprocess with the TPU plugin disabled
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)), timeout=3600)
    cpu_rate = None
    for line in proc.stdout.splitlines():
        try:
            cpu_rate = json.loads(line)["cpu_sentences_per_sec"]
        except (json.JSONDecodeError, KeyError):
            continue
    if cpu_rate is None:
        sys.stderr.write(proc.stdout + "\n" + proc.stderr + "\n")
        raise RuntimeError("CPU baseline failed")

    verify_kernels_on_device()
    tpu_stats = tpu_throughput()
    tpu_rate = tpu_stats["value"]

    # secondary headline metrics (VERDICT r1 item 4: one bench run
    # must regression-guard all four paths, not just RNN decode).
    # They ride inside the flagship JSON line's "extra" field so the
    # driver-parsed line stays exactly the documented contract.
    extra = {}

    def _try(label, fn):
        try:
            extra[label] = fn()
            print(f"bench extra: {label} = {extra[label]}",
                  file=sys.stderr)
        except Exception as exc:  # one failing aux metric must not
            extra[label] = None   # kill the flagship measurement
            print(f"bench extra: {label} FAILED: {exc}",
                  file=sys.stderr)

    if "--flagship-only" not in sys.argv:
        _try("transformer_beam10_sentences_per_sec",
             transformer_decode_throughput)
        _try("rnn_train_tokens_per_sec",
             lambda: train_throughput("rnn")["spread"])
        _try("transformer_train_tokens_per_sec",
             lambda: train_throughput("transformer")["spread"])
        # RANDOM-weight flip rates are loose upper bounds (near-uniform
        # logits maximize near-ties); the trained-weights rate measured
        # 0.0 for both models (bench.py --flip, BASELINE.md) — the
        # field names say so, so an artifact-only reader cannot read
        # 9% as product behavior (VERDICT r3 weak #4)
        # beam-width + long-source regression rows (VERDICT r4 item 6)
        _try("rnn_beam4_sentences_per_sec",
             lambda: _decode_variant(beam=4))
        _try("rnn_beam20_sentences_per_sec",
             lambda: _decode_variant(beam=20))
        _try("transformer_src512_beam10_sentences_per_sec",
             lambda: _decode_variant(src_len=512, transformer=True))
        _try("rnn_lineage_flip_rate_random_weights_upper_bound",
             lambda: round(lineage_flip_rate("rnn"), 5))
        _try("transformer_lineage_flip_rate_random_weights_upper_bound",
             lambda: round(lineage_flip_rate("transformer"), 5))
        extra["lineage_flip_rate_trained_weights"] = {
            "note": "measured via bench.py --flip (400 real training "
                    "steps): 0.0 for both models — BASELINE.md"}

    # achieved TFLOP/s + MFU for the four headline metrics (VERDICT
    # r2 item 3): analytic model FLOPs / measured wall time, against
    # the chip's MEASURED matmul ceiling — catches an MXU-utilization
    # regression that tok/s alone would hide
    flops = analytic_flops()
    try:
        ceiling_spread = measure_matmul_ceiling_spread()
    except Exception as exc:
        print(f"bench: ceiling measurement failed ({exc}); "
              "using fallback", file=sys.stderr)
        ceiling_spread = {"value": _TFLOPS_FALLBACK, "n": 0,
                          "source": "fallback"}
    ceiling = ceiling_spread["value"]

    def _mfu_entry(flops_per_unit, units_per_sec):
        achieved = flops_per_unit * units_per_sec
        return {"achieved_tflops": round(achieved / 1e12, 2),
                "mfu_vs_measured_ceiling": round(
                    achieved / ceiling, 3)}

    mfu = {"rnn_beam10_decode": _mfu_entry(
        flops["rnn_decode_batch"], tpu_rate / BATCH)}
    if extra.get("transformer_beam10_sentences_per_sec"):
        mfu["transformer_beam10_decode"] = _mfu_entry(
            flops["transformer_decode_batch"],
            extra["transformer_beam10_sentences_per_sec"]["value"]
            / BATCH)
    if extra.get("rnn_train_tokens_per_sec"):
        mfu["rnn_train"] = _mfu_entry(
            flops["rnn_train_step"],
            extra["rnn_train_tokens_per_sec"]["value"]
            / (BATCH * MAX_OUT))
    if extra.get("transformer_train_tokens_per_sec"):
        mfu["transformer_train"] = _mfu_entry(
            flops["transformer_train_step"],
            extra["transformer_train_tokens_per_sec"]["value"]
            / (BATCH * MAX_OUT))
    mfu["measured_ceiling_tflops"] = round(ceiling / 1e12, 2)
    # denominator spread (VERDICT r4 item 5): MFU is computed against
    # the MEDIAN ceiling; min/max make cross-round MFU deltas signal
    mfu["ceiling_spread"] = {
        k: (round(v / 1e12, 2) if k in ("value", "min", "max") else v)
        for k, v in ceiling_spread.items()}
    # shape-matched ceiling: the train step's own dominant GEMM class
    # ((3072, 512)x(512, 30720)) so ~0.5 train MFU is attributable to
    # shapes vs lowering
    try:
        sm = measure_shape_matched_ceiling()
        mfu["shape_matched_ceiling_tflops"] = {
            k: (round(v / 1e12, 2)
                if k in ("value", "min", "max") else v)
            for k, v in sm.items()}
    except Exception as exc:
        print(f"bench: shape-matched ceiling failed: {exc}",
              file=sys.stderr)
    extra["mfu"] = mfu

    line = {
        "metric": "beam10_decoded_sentences_per_sec_per_chip",
        "value": tpu_rate,
        "spread": tpu_stats,
        "unit": "sentences/sec/chip",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }
    if extra:
        line["extra"] = extra
    print(json.dumps(line))


if __name__ == "__main__":
    main()
