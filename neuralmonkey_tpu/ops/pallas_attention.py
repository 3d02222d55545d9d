"""Pallas TPU attention kernels.

1. :func:`flash_attention` — blockwise (FlashAttention-style) fused
   score→softmax→context for multi-head attention: the O(T²) score
   matrix never materializes in HBM; each (q-block, kv-block) tile is
   computed in VMEM with the numerically-stable running-max/-sum
   rescaling.
2. :func:`fused_bahdanau_step` — one decoder step of Bahdanau
   attention (energies = v·tanh(keys + query), masked softmax, context)
   fused into a single kernel so the per-step intermediates
   (B, T, A) never leave VMEM (BASELINE.json: "fused attention
   score→softmax→context").

Both are golden-tested against the pure-JAX references
(ops/attention.py / models/attention/feed_forward.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .kernel_config import pallas_interpret

NEG_INF = -1e9

# dropout keep-bit threshold uses the hash's low 23 bits
_KEEP_BITS = 23
# numpy scalars, NOT jnp: jax array constants would be captured by the
# Pallas kernel closure, which pallas_call rejects
import numpy as np  # noqa: E402

_MIX1 = np.int32(0x85EBCA6B - (1 << 32))  # murmur3 fmix32 constants
_MIX2 = np.int32(0xC2B2AE35 - (1 << 32))
_GOLD = np.int32(0x9E3779B9 - (1 << 32))  # bh-word mixing


def _fmix32(h):
    """murmur3 finalizer on int32 with wrapping arithmetic. Pure
    jnp/lax ops only, so the SAME function runs inside the Pallas
    kernels and in the dense reference twin — keep masks are
    bit-identical between the two paths by construction."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _MIX1
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * _MIX2
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _keep_hash(k0, k1, bh, pos):
    """Counter-based keep bits for attention-dropout: the value
    depends only on the rng key words and the GLOBAL (batch·head,
    q·kv_span + k) position, so any tile computing a given score —
    forward block, dq block, dkv block — draws the same bits (the
    ring's per-block trick, parallel/ring_attention._block_keep,
    applied inside the kernel)."""
    h = _fmix32(pos ^ k0)
    return _fmix32(h ^ (bh * _GOLD) ^ k1)


def _keep_thresh(keep_prob: float) -> np.int32:
    return np.int32(int(round(keep_prob * (1 << _KEEP_BITS))))


def rng_to_key_words(rng: jnp.ndarray) -> jnp.ndarray:
    """(2,) int32 key words from a jax PRNG key (raw uint32 pairs and
    typed keys both accepted) — the form the kernels consume."""
    arr = jnp.asarray(rng)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        arr = jax.random.key_data(arr)
    arr = arr.reshape(-1).astype(jnp.uint32)
    if arr.size < 2:
        arr = jnp.concatenate([arr, arr])
    return jax.lax.bitcast_convert_type(arr[:2], jnp.int32)


# ---------------------------------------------------------------------- #
# flash attention (forward)
# ---------------------------------------------------------------------- #
def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, *refs,
                  kv_len: int, block_kv: int, scale: float,
                  causal: bool, keep_prob: float = 1.0,
                  kv_span: int = 0):
    dropout = keep_prob < 1.0
    if dropout:
        key_ref, o_ref, lse_ref = refs
        k0 = key_ref[0]
        k1 = key_ref[1]
        thresh = _keep_thresh(keep_prob)
        bh_idx = pl.program_id(0)
    else:
        o_ref, lse_ref = refs
    # blocks carry a leading (batch·head) dim of size 1
    block_q = q_ref.shape[1]
    head_dim = q_ref.shape[2]
    q = q_ref[0] * scale

    acc = jnp.zeros((block_q, head_dim), jnp.float32)
    row_max = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    row_sum = jnp.zeros((block_q, 1), jnp.float32)

    q_start = pl.program_id(1) * block_q
    num_kv_blocks = kv_len // block_kv

    def body(kv_idx, carry):
        acc, row_max, row_sum = carry
        kv_start = kv_idx * block_kv
        k_blk = k_ref[0, pl.ds(kv_start, block_kv), :]
        v_blk = v_ref[0, pl.ds(kv_start, block_kv), :]
        # mask arrives sublane-expanded (bh, 8, Tk); read one 2-D row
        m_blk = mask_ref[0, 0:1, pl.ds(kv_start, block_kv)]

        # default matmul precision: bf16 operand passes with f32
        # accumulation — the same MXU semantics as the pure-JAX
        # reference's einsum (HIGHEST costs 3-6 MXU passes per matmul
        # and measured ~12% of the whole T=256 transformer train step)
        scores = jnp.dot(q, k_blk.T,
                         preferred_element_type=jnp.float32)
        scores = jnp.where(m_blk > 0, scores, NEG_INF)
        if causal:
            q_pos = (q_start
                     + jax.lax.broadcasted_iota(
                         jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start
                     + jax.lax.broadcasted_iota(
                         jnp.int32, (block_q, block_kv), 1))
            scores = jnp.where(q_pos >= k_pos, scores, NEG_INF)

        new_max = jnp.maximum(row_max,
                              jnp.max(scores, axis=1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(scores - new_max)
        # dense dropout semantics: applied AFTER softmax, so the
        # normalizer accumulates the UNdropped mass while the context
        # accumulates the dropped probabilities
        new_sum = row_sum * correction + jnp.sum(p, axis=1,
                                                 keepdims=True)
        pv = p
        if dropout:
            q_pos = (q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1))
            bits = _keep_hash(k0, k1, bh_idx, q_pos * kv_span + k_pos)
            keep = (bits & np.int32((1 << _KEEP_BITS) - 1)) < thresh
            pv = jnp.where(keep, p, 0.0) * (1.0 / keep_prob)
        new_acc = acc * correction + jnp.dot(
            pv, v_blk, preferred_element_type=jnp.float32)
        return new_acc, new_max, new_sum

    if causal:
        # blocks strictly above the diagonal are fully masked — skip
        # them (halves the causal forward's work on average)
        num_kv_blocks = jnp.minimum(
            num_kv_blocks,
            (q_start + block_q + block_kv - 1) // block_kv)
    acc, row_max, row_sum = jax.lax.fori_loop(
        0, num_kv_blocks, body, (acc, row_max, row_sum))
    o_ref[0] = (acc / jnp.maximum(row_sum, 1e-20)).astype(o_ref.dtype)
    # per-row logsumexp of the SCALED+masked scores, saved for the
    # backward kernels: P = exp(s - lse) is the normalized softmax.
    # (block_q, 1) column layout — the lse array keeps a trailing
    # singleton dim so no in-kernel transpose is ever needed.
    lse_ref[0] = row_max + jnp.log(jnp.maximum(row_sum, 1e-20))


def _head_pad(head_dim: int) -> int:
    """Padding needed to make the head dim Mosaic-legal as a block's
    last dimension: multiples and divisors of the 128-lane both lower
    (64 stays 64 — halving HBM traffic and footprint vs padding)."""
    if head_dim % 128 == 0 or 128 % head_dim == 0:
        return 0
    return (-head_dim) % 128


def _reference_flash(q, k, v, mask, causal: bool,
                     dropout_key=None, keep_prob: float = 1.0,
                     shard_fold=None):
    """Dense reference. With ``dropout_key`` it applies the kernels'
    hash-based keep mask (same ``_keep_hash`` sites, same global
    counters) so kernel-vs-reference agreement holds bit-for-bit on
    the mask — this twin is also what the XLA-remat backward
    differentiates through, so forward and backward see one mask.
    ``shard_fold=(dp, mp)`` reproduces GLOBALLY the per-shard folded
    keys + LOCAL (batch·head) counters a (dp, mp)-way sharded kernel
    forward drew (the nested-context backward, _flash_sharded_bwd)."""
    from .attention import (attention_bias_from_mask, causal_bias,
                            dot_product_attention)
    bias = attention_bias_from_mask(mask)
    if causal:
        bias = bias + causal_bias(k.shape[2])[:, :, :q.shape[2], :]
    if dropout_key is None or keep_prob >= 1.0:
        return dot_product_attention(q, k, v, bias)
    import math as _math
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    scale = 1.0 / _math.sqrt(head_dim)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(k.dtype), k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias
    weights = jax.nn.softmax(scores, axis=-1)
    keep = _keep_mask_dense(dropout_key, batch, heads, q_len, kv_len,
                            keep_prob, shard_fold)
    weights = jnp.where(keep, weights, 0.0) * (1.0 / keep_prob)
    context = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype),
                         v, preferred_element_type=jnp.float32)
    return context.astype(v.dtype)


def _dense_shard_fold(plan):
    """(dp, mp) wrapped-axis sizes whose per-shard key fold the dense
    twin must reproduce, or None when one shard (no fold)."""
    if plan is None or plan.data * plan.model == 1:
        return None
    return (plan.data, plan.model)


def _keep_mask_dense(dropout_key, batch: int, heads: int, q_len: int,
                     kv_len: int, keep_prob: float,
                     shard_fold=None) -> jnp.ndarray:
    """The kernels' keep mask materialized densely (reference twin +
    remat backward): (B, H, Tq, Tk) bool. ``kv_span`` in the counters
    is the UNPADDED kv length — the kernels use the same constant, so
    padding/tiling never changes which bits a valid position draws.
    With ``shard_fold=(dp, mp)`` the key words carry the per-shard
    fold (_shard_fold_key) and the (batch·head) counter is the
    shard-LOCAL one, matching a sharded kernel forward bit-for-bit."""
    k0 = dropout_key[0]
    k1 = dropout_key[1]
    if shard_fold is None:
        bh = jnp.arange(batch * heads, dtype=jnp.int32).reshape(
            batch, heads, 1, 1)
    else:
        dp, mp = shard_fold
        b = jnp.arange(batch, dtype=jnp.int32)[:, None]
        h = jnp.arange(heads, dtype=jnp.int32)[None, :]
        ix = (b // (batch // dp)) * mp + h // (heads // mp)
        k0 = (k0 ^ (ix * _GOLD))[:, :, None, None]
        bh = ((b % (batch // dp)) * (heads // mp)
              + h % (heads // mp))[:, :, None, None]
    pos = (jnp.arange(q_len, dtype=jnp.int32)[:, None] * kv_len
           + jnp.arange(kv_len, dtype=jnp.int32)[None, :])
    bits = _keep_hash(k0, k1, bh, pos[None, None])
    return (bits & np.int32((1 << _KEEP_BITS) - 1)) \
        < _keep_thresh(keep_prob)


def _flash_attention_pallas(q, k, v, mask, causal: bool,
                            block_q: int, block_kv: int,
                            dropout_key=None,
                            keep_prob: float = 1.0) -> jnp.ndarray:
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    scale = 1.0 / (head_dim ** 0.5)

    # TPU lanes: a block's last dim must be a multiple OR a divisor of
    # the 128-lane. Zero-pad other head dims — zeros are inert in both
    # the scores and the output. (Unconditional padding doubled every
    # HBM buffer at D=64 and OOM'd the T=512 train step.)
    orig_head_dim = head_dim
    pad_head = _head_pad(head_dim)
    if pad_head:
        pads = ((0, 0), (0, 0), (0, 0), (0, pad_head))
        q = jnp.pad(q, pads)
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
        head_dim += pad_head

    block_q = min(block_q, q_len)
    block_kv = min(block_kv, kv_len)
    if not pallas_interpret():
        # Mosaic tiling: sublane multiple of 8, lane multiple of 128
        block_q = max(8, ((block_q + 7) // 8) * 8)
        block_kv = max(128, ((block_kv + 127) // 128) * 128)
    pad_q = (-q_len) % block_q
    pad_kv = (-kv_len) % block_kv
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_kv)))
    q_pad_len = q_len + pad_q
    kv_pad_len = kv_len + pad_kv

    bh = batch * heads
    q_flat = q.reshape(bh, q_pad_len, head_dim)
    k_flat = k.reshape(bh, kv_pad_len, head_dim)
    v_flat = v.reshape(bh, kv_pad_len, head_dim)
    mask_rep = jnp.repeat(mask[:, None, :], heads,
                          axis=1).reshape(bh, kv_pad_len)
    # sublane-expand for Mosaic tiling (see kernel comment)
    mask_rep = jnp.broadcast_to(mask_rep[:, None, :],
                                (bh, 8, kv_pad_len))

    dropout = dropout_key is not None and keep_prob < 1.0
    kernel = functools.partial(
        _flash_kernel, kv_len=kv_pad_len, block_kv=block_kv,
        scale=scale, causal=causal,
        keep_prob=keep_prob if dropout else 1.0,
        kv_span=kv_len if dropout else 0)

    in_specs = [
        pl.BlockSpec((1, block_q, head_dim),
                     lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, kv_pad_len, head_dim),
                     lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, kv_pad_len, head_dim),
                     lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, 8, kv_pad_len), lambda b, i: (b, 0, 0)),
    ]
    operands = [q_flat, k_flat, v_flat, mask_rep]
    if dropout:
        from jax.experimental.pallas import tpu as pltpu
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(dropout_key.astype(jnp.int32))

    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, q_pad_len, head_dim), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad_len, 1), jnp.float32),
        ),
        grid=(bh, q_pad_len // block_q),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, head_dim),
                         lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ),
        interpret=pallas_interpret(),
    )(*operands)

    out = out.reshape(batch, heads, q_pad_len, head_dim)
    lse = lse.reshape(batch, heads, q_pad_len)
    if pad_q:
        out = out[:, :, :q_len]
        lse = lse[:, :, :q_len]
    if pad_head:
        out = out[..., :orig_head_dim]
    return out, lse


# ---------------------------------------------------------------------- #
# flash attention (backward)
#
# Hand-written dq / dk+dv kernels (FlashAttention-2 recipe): P is
# recomputed blockwise from (q, k, lse) so the O(T²) score matrix never
# hits HBM on the backward pass either (VERDICT r1 item 1 — the old
# backward rematerialized through the pure-JAX reference and
# materialized (B, H, Tq, Tk) in HBM). All stats ride in (rows, 1)
# column layout; every transpose is fused into a dot.
# ---------------------------------------------------------------------- #
def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                         lse_ref, dcap_ref, *refs,
                         kv_len: int, block_kv: int, scale: float,
                         causal: bool, keep_prob: float = 1.0,
                         kv_span: int = 0):
    dropout = keep_prob < 1.0
    if dropout:
        key_ref, dq_ref = refs
        k0 = key_ref[0]
        k1 = key_ref[1]
        thresh = _keep_thresh(keep_prob)
        bh_idx = pl.program_id(0)
    else:
        (dq_ref,) = refs
    block_q = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                     # (block_q, 1) f32
    dcap = dcap_ref[0]                   # (block_q, 1) f32 = rowsum(dO·O)
    q_start = pl.program_id(1) * block_q

    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)

    def body(kv_idx, acc):
        kv_start = kv_idx * block_kv
        k_blk = k_ref[0, pl.ds(kv_start, block_kv), :].astype(
            jnp.float32)
        v_blk = v_ref[0, pl.ds(kv_start, block_kv), :].astype(
            jnp.float32)
        m_blk = mask_ref[0, 0:1, pl.ds(kv_start, block_kv)]

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(m_blk > 0, s, NEG_INF)
        if causal:
            q_pos = (q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1))
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse)                          # normalized
        dp = jnp.dot(do, v_blk.T,
                     preferred_element_type=jnp.float32)
        if dropout:
            # dropped context: dW = (g·Vᵀ) ⊙ keep / kp; the softmax
            # backward's row term still equals D = rowsum(g ⊙ O)
            # because O itself was accumulated from the dropped P
            q_pos = (q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1))
            bits = _keep_hash(k0, k1, bh_idx, q_pos * kv_span + k_pos)
            keep = (bits & np.int32((1 << _KEEP_BITS) - 1)) < thresh
            dp = jnp.where(keep, dp, 0.0) * (1.0 / keep_prob)
        ds = p * (dp - dcap)
        return acc + jnp.dot(ds, k_blk,
                             preferred_element_type=jnp.float32)

    num_kv = kv_len // block_kv
    if causal:
        # kv blocks strictly above this q block's diagonal are masked
        num_kv = jnp.minimum(
            num_kv, (q_start + block_q + block_kv - 1) // block_kv)
    acc = jax.lax.fori_loop(0, num_kv, body, acc)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                          lse_ref, dcap_ref, *refs,
                          q_len: int, block_q: int, scale: float,
                          causal: bool, keep_prob: float = 1.0,
                          kv_span: int = 0):
    dropout = keep_prob < 1.0
    if dropout:
        key_ref, dk_ref, dv_ref = refs
        k0 = key_ref[0]
        k1 = key_ref[1]
        thresh = _keep_thresh(keep_prob)
        bh_idx = pl.program_id(0)
    else:
        dk_ref, dv_ref = refs
    block_kv = k_ref.shape[1]
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    m_blk = mask_ref[0, 0:1, :]          # (1, block_kv)
    kv_start = pl.program_id(1) * block_kv

    dk = jnp.zeros_like(k_blk)
    dv = jnp.zeros_like(v_blk)

    def body(q_idx, carry):
        dk, dv = carry
        q_start = q_idx * block_q
        q_blk = q_ref[0, pl.ds(q_start, block_q), :].astype(
            jnp.float32)
        do_blk = do_ref[0, pl.ds(q_start, block_q), :].astype(
            jnp.float32)
        lse_blk = lse_ref[0, pl.ds(q_start, block_q), :]   # (bq, 1)
        dcap_blk = dcap_ref[0, pl.ds(q_start, block_q), :]

        s = jnp.dot(q_blk, k_blk.T,
                    preferred_element_type=jnp.float32) * scale
        s = jnp.where(m_blk > 0, s, NEG_INF)
        if causal:
            q_pos = (q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1))
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse_blk)
        pd = p
        dp = jnp.dot(do_blk, v_blk.T,
                     preferred_element_type=jnp.float32)
        if dropout:
            q_pos = (q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0))
            k_pos = (kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1))
            bits = _keep_hash(k0, k1, bh_idx, q_pos * kv_span + k_pos)
            keep = (bits & np.int32((1 << _KEEP_BITS) - 1)) < thresh
            # dV sees the DROPPED probabilities; dP is masked the
            # same way (the forward's O = Σ (p·keep/kp)·v)
            pd = jnp.where(keep, p, 0.0) * (1.0 / keep_prob)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / keep_prob)
        dv = dv + jnp.dot(pd.T, do_blk,
                          preferred_element_type=jnp.float32)
        ds = p * (dp - dcap_blk)
        dk = dk + jnp.dot(ds.T, q_blk,
                          preferred_element_type=jnp.float32)
        return dk, dv

    q_lo = 0
    if causal:
        # q blocks entirely before this kv block see none of it
        q_lo = kv_start // block_q
    dk, dv = jax.lax.fori_loop(q_lo, q_len // block_q, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, mask, out, lse, g, causal: bool,
                           dropout_key=None, keep_prob: float = 1.0):
    """dq, dk, dv via the blockwise kernels. Blocks are fixed at
    128×128: backward slices the LANE-adjacent stats arrays with
    ``pl.ds`` at q-block offsets, which must stay 128-aligned (Mosaic);
    padded q rows are inert because their dO is zero-padded."""
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    scale = 1.0 / (head_dim ** 0.5)
    dropout = dropout_key is not None and keep_prob < 1.0
    drop_kw = dict(keep_prob=keep_prob if dropout else 1.0,
                   kv_span=kv_len if dropout else 0)
    block = 128 if not pallas_interpret() else max(
        8, min(128, q_len), min(128, kv_len))

    orig_head_dim = head_dim
    pad_head = _head_pad(head_dim)
    pad_q = (-q_len) % block
    pad_kv = (-kv_len) % block
    if pad_head:
        pads = ((0, 0), (0, 0), (0, 0), (0, pad_head))
        q, k, v, g, out = (jnp.pad(x, pads)
                           for x in (q, k, v, g, out))
        head_dim += pad_head
    if pad_q:
        pads = ((0, 0), (0, 0), (0, pad_q), (0, 0))
        q = jnp.pad(q, pads)
        g = jnp.pad(g, pads)
        out = jnp.pad(out, pads)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q)))
    if pad_kv:
        pads = ((0, 0), (0, 0), (0, pad_kv), (0, 0))
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
        mask = jnp.pad(mask, ((0, 0), (0, pad_kv)))
    qp, kp = q_len + pad_q, kv_len + pad_kv

    bh = batch * heads
    q_flat = q.reshape(bh, qp, head_dim)
    k_flat = k.reshape(bh, kp, head_dim)
    v_flat = v.reshape(bh, kp, head_dim)
    g_flat = g.reshape(bh, qp, head_dim)
    # D_i = Σ_d dO_id·O_id, in the same (rows, 1) layout as lse
    dcap = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1).reshape(bh, qp, 1)
    lse_flat = lse.astype(jnp.float32).reshape(bh, qp, 1)
    mask_rep = jnp.repeat(mask.astype(jnp.float32)[:, None, :], heads,
                          axis=1).reshape(bh, kp)
    mask_rep = jnp.broadcast_to(mask_rep[:, None, :], (bh, 8, kp))

    common_specs = dict(interpret=pallas_interpret())
    dq_in_specs = [
        pl.BlockSpec((1, block, head_dim), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, kp, head_dim), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, kp, head_dim), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, 8, kp), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, block, head_dim), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block, 1), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, block, 1), lambda b, i: (b, i, 0)),
    ]
    dq_operands = [q_flat, k_flat, v_flat, mask_rep, g_flat,
                   lse_flat, dcap]
    dkv_in_specs = [
        pl.BlockSpec((1, qp, head_dim), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, block, head_dim), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, block, head_dim), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, 8, block), lambda b, j: (b, 0, j)),
        pl.BlockSpec((1, qp, head_dim), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, qp, 1), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, qp, 1), lambda b, j: (b, 0, 0)),
    ]
    dkv_operands = list(dq_operands)
    if dropout:
        from jax.experimental.pallas import tpu as pltpu
        key_i32 = dropout_key.astype(jnp.int32)
        for specs, ops in ((dq_in_specs, dq_operands),
                           (dkv_in_specs, dkv_operands)):
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            ops.append(key_i32)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, kv_len=kp,
                          block_kv=block, scale=scale, causal=causal,
                          **drop_kw),
        out_shape=jax.ShapeDtypeStruct((bh, qp, head_dim), q.dtype),
        grid=(bh, qp // block),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, block, head_dim),
                               lambda b, i: (b, i, 0)),
        **common_specs,
    )(*dq_operands)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, q_len=qp,
                          block_q=block, scale=scale, causal=causal,
                          **drop_kw),
        out_shape=(
            jax.ShapeDtypeStruct((bh, kp, head_dim), k.dtype),
            jax.ShapeDtypeStruct((bh, kp, head_dim), v.dtype),
        ),
        grid=(bh, kp // block),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, block, head_dim), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block, head_dim), lambda b, j: (b, j, 0)),
        ),
        **common_specs,
    )(*dkv_operands)

    dq = dq.reshape(batch, heads, qp, head_dim)[:, :, :q_len]
    dk = dk.reshape(batch, heads, kp, head_dim)[:, :, :kv_len]
    dv = dv.reshape(batch, heads, kp, head_dim)[:, :, :kv_len]
    if pad_head:
        dq = dq[..., :orig_head_dim]
        dk = dk[..., :orig_head_dim]
        dv = dv[..., :orig_head_dim]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 8))
def flash_attention(q, k, v, mask, causal: bool = False,
                    block_q: int = 128, block_kv: int = 128,
                    dropout_key=None, keep_prob: float = 1.0):
    """(B, H, Tq, D) × (B, H, Tk, D) → (B, H, Tq, D).

    ``mask``: (B, Tk) float key-validity mask. Equivalent to
    ``dot_product_attention`` with ``attention_bias_from_mask(mask)``
    (+ causal bias when ``causal``). Backward: XLA rematerialization
    through the pure-JAX reference below ~2 GB of score-matrix memory
    (the measured-faster path on v5e at T<=512), the hand-written
    dq/dkv Pallas kernels above it (no O(T²) HBM in either direction);
    NM_FLASH_BWD=1/0 forces the choice.

    ``dropout_key`` ((2,) int32 from :func:`rng_to_key_words`) +
    ``keep_prob`` < 1 enable ATTENTION DROPOUT INSIDE THE KERNEL:
    keep bits are drawn counter-based per (batch·head, q, k) position
    (``_keep_hash``), so the O(T²) mask never materializes in HBM and
    forward/backward/reference all agree bit-for-bit on which weights
    drop (VERDICT r3 item 4 — dropout no longer forces the dense
    path). Reference: nm/attention/scaled_dot_product.py keeps
    dropout inside attention."""
    # the kernel's masking path is f32-only (bf16 masks arrive under
    # the compute-precision policy and buy nothing)
    mask = mask.astype(jnp.float32)
    out, _ = _flash_attention_pallas(q, k, v, mask, causal,
                                     block_q, block_kv,
                                     dropout_key, keep_prob)
    return out


def _flash_fwd(q, k, v, mask, causal, block_q, block_kv,
               dropout_key, keep_prob):
    mask = mask.astype(jnp.float32)
    out, lse = _flash_attention_pallas(q, k, v, mask, causal,
                                       block_q, block_kv,
                                       dropout_key, keep_prob)
    return out, (q, k, v, mask, dropout_key, out, lse)


# Above this much O(T²) score-matrix memory the XLA rematerialized
# backward risks OOM and the blockwise kernels take over. Below it the
# XLA path is the measured-faster choice on v5e (A/B at the production
# shape B=64/H=8/D=64, f32 train tokens/sec: T=256 99.1k XLA vs 88.9k
# Pallas; T=512 both fit and XLA stays ahead) — the kernels' win is
# memory, not speed, in the product's <=512-token range.
_PALLAS_BWD_BYTES_THRESHOLD = 2 * 1024 ** 3


def _use_pallas_bwd(q, k) -> bool:
    import os
    env = os.environ.get("NM_FLASH_BWD")
    if env is not None and env != "":
        return env not in ("0", "false", "False")
    batch, heads, q_len, _ = q.shape
    scores_bytes = batch * heads * q_len * k.shape[2] * 4
    return scores_bytes >= _PALLAS_BWD_BYTES_THRESHOLD


def _flash_bwd(causal, block_q, block_kv, keep_prob, residuals, g):
    q, k, v, mask, dropout_key, out, lse = residuals
    import numpy as _np
    key_ct = (None if dropout_key is None
              else _np.zeros(dropout_key.shape, jax.dtypes.float0))
    from .kernel_config import use_pallas_train
    if (pallas_interpret()
            or (use_pallas_train() and _use_pallas_bwd(q, k))):
        dq, dk, dv = _flash_backward_pallas(
            q, k, v, mask, out, lse, g, causal, dropout_key, keep_prob)
        return dq, dk, dv, jnp.zeros_like(mask), key_ct
    # the measured-faster path at short/medium T: XLA
    # rematerialization through the pure-JAX reference (materializes
    # the score matrix — fine until _PALLAS_BWD_BYTES_THRESHOLD); the
    # reference twin replays the SAME hash-based keep mask
    _, vjp = jax.vjp(
        lambda q_, k_, v_, m_: _reference_flash(
            q_, k_, v_, m_, causal, dropout_key, keep_prob),
        q, k, v, mask)
    return vjp(g) + (key_ct,)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_sharded_ok(q: jnp.ndarray) -> bool:
    """Whether the current trace context can shard_map-wrap the flash
    kernel for this operand: batch divides 'data', heads divide
    'model' (kernel_config.note_mesh rationale)."""
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is None:
        return False
    return (q.shape[0] % plan.data == 0
            and q.shape[1] % plan.model == 0)


def flash_attention_sharded(q, k, v, mask, causal: bool = False,
                            dropout_key=None, keep_prob: float = 1.0):
    """Flash attention on a multi-device mesh: shard_map-wrapped per
    data(/model) shard of the batch/head axes — fully manual at top
    level, a NESTED partial wrap over the still-auto axes inside a
    GPipe/MoE body (kernel_config.spmd_wrap_plan). Caller checked
    :func:`flash_sharded_ok`.

    The VJP is explicit at the WRAP level: forward and backward are
    each ONE self-contained shard_map with declared in/out specs (the
    lse statistic is a declared output that re-enters the backward as
    a declared input). Letting jax transpose an inner shard_map would
    instead thread custom-vjp residuals through inferred specs, which
    the XLA partitioner rejects with a manual-subgroup CHECK failure
    when TWO wrapped call sites share one partial-auto stage body
    (the pipelined decoder's self+cross attention — found round 4).

    With dropout, each shard folds its mesh position into the key
    words — the in-kernel hash counters are LOCAL (batch·head, pos),
    so without the fold every data shard would redraw the same mask
    (the flaw the ring's global-chunk counters avoid)."""
    import jax
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    dropout = dropout_key is not None and keep_prob < 1.0
    key_arg = jax.lax.bitcast_convert_type(
        dropout_key.astype(jnp.int32) if dropout
        else jnp.zeros((2,), jnp.int32), jnp.float32)
    del plan
    return _flash_sharded_vjp(q, k, v, mask.astype(jnp.float32),
                              key_arg, causal, keep_prob, dropout)


def _sharded_specs():
    """(plan, qspec, mask_spec, stat_spec) for the current context."""
    from jax.sharding import PartitionSpec as P
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    hm = "model" if plan.model > 1 else None
    dm = "data" if plan.data > 1 else None
    return (plan, P(dm, hm, None, None), P(dm, None), P(dm, hm, None))


def _shard_fold_key(key_f32, ixd, ixm, plan, dropout: bool):
    """Per-shard kernel key words (or None): fold the mesh position
    of the wrapped axes into the key so shards draw distinct masks.
    The shard index arrives as (1,)-sliced iota inputs (``ixd``/
    ``ixm``), NOT ``jax.lax.axis_index`` — inside a NESTED wrap the
    axis_index lowering emits an sdy.manual_computation that re-binds
    the outer manual axes and fails MLIR verification (found r4)."""
    import jax
    if not dropout:
        return None
    key_ = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(key_f32), jnp.int32)
    ix = ixd[0] * plan.model + ixm[0]
    return jnp.stack([key_[0] ^ (ix * _GOLD), key_[1]])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_sharded_vjp(q, k, v, mask, key_f32, causal: bool,
                       keep_prob: float, dropout: bool):
    out, _ = _flash_sharded_fwd_call(q, k, v, mask, key_f32, causal,
                                     keep_prob, dropout)
    return out


def _flash_sharded_fwd_call(q, k, v, mask, key_f32, causal,
                            keep_prob, dropout):
    plan, qspec, mspec, sspec = _sharded_specs()

    def body(q_, k_, v_, m_, kf_, ixd, ixm):
        key_ = _shard_fold_key(kf_, ixd, ixm, plan, dropout)
        return _flash_attention_pallas(
            q_, k_, v_, m_, causal, 128, 128, key_,
            keep_prob if dropout else 1.0)

    wrapped = plan.shard_map(
        body,
        in_specs=(qspec, qspec, qspec, mspec, _P_NONE())
        + _ix_specs(plan),
        out_specs=(qspec, sspec))
    return wrapped(q, k, v, mask, key_f32, *_ix_iotas(plan))


def _P_NONE():
    from jax.sharding import PartitionSpec as P
    return P(None)


def _ix_specs(plan):
    """in_specs for the (dp,)/(mp,) shard-index iotas: sliced along
    their axis so each shard reads its own index at element 0 (a
    1-sized axis rides replicated as [0])."""
    from jax.sharding import PartitionSpec as P
    return (P("data") if plan.data > 1 else P(None),
            P("model") if plan.model > 1 else P(None))


def _ix_iotas(plan):
    """(dp,) and (mp,) int32 shard-index iotas."""
    return (jnp.arange(plan.data, dtype=jnp.int32),
            jnp.arange(plan.model, dtype=jnp.int32))


def _flash_sharded_fwd(q, k, v, mask, key_f32, causal, keep_prob,
                       dropout):
    out, lse = _flash_sharded_fwd_call(q, k, v, mask, key_f32,
                                       causal, keep_prob, dropout)
    return out, (q, k, v, mask, key_f32, out, lse)


def _flash_sharded_bwd(causal, keep_prob, dropout, residuals, g):
    import jax
    q, k, v, mask, key_f32, out, lse = residuals
    plan, qspec, mspec, sspec = _sharded_specs()
    if plan.axis_names is not None:
        # NESTED context (inside a GPipe/MoE stage body): the backward
        # runs as plain GSPMD code — an inner bwd shard_map here feeds
        # residuals whose sharding keeps the outer manual subgroup
        # into specs that dropped it, and the XLA partitioner aborts
        # on the mismatch (spmd_partitioner.cc IsManualSubgroup CHECK,
        # found round 4 with self+cross flash in one pipelined stage).
        # The dense-reference remat is also the measured-faster
        # backward at product sequence lengths (see
        # _PALLAS_BWD_BYTES_THRESHOLD).
        key_ = (jax.lax.bitcast_convert_type(key_f32, jnp.int32)
                if dropout else None)
        kp = keep_prob if dropout else 1.0
        _, vjp = jax.vjp(
            lambda a, b, c, m: _reference_flash(
                a, b, c, m, causal, key_, kp,
                shard_fold=_dense_shard_fold(plan)),
            q, k, v, mask)
        dq, dk, dv, _ = vjp(g)
        return dq, dk, dv, jnp.zeros_like(mask), \
            jnp.zeros_like(key_f32)
    from .kernel_config import use_pallas_train
    use_kernels = (pallas_interpret()
                   or (use_pallas_train() and _use_pallas_bwd(q, k)))

    def body(q_, k_, v_, m_, kf_, out_, lse_, g_, ixd, ixm):
        key_ = _shard_fold_key(kf_, ixd, ixm, plan, dropout)
        kp = keep_prob if dropout else 1.0
        if use_kernels:
            return _flash_backward_pallas(q_, k_, v_, m_, out_, lse_,
                                          g_, causal, key_, kp)
        # measured-faster short-T path: XLA remat through the dense
        # reference twin (same hash keep mask by construction)
        _, vjp = jax.vjp(
            lambda a, b, c, m: _reference_flash(a, b, c, m, causal,
                                                key_, kp),
            q_, k_, v_, m_)
        dq, dk, dv, _ = vjp(g_)
        return dq, dk, dv

    wrapped = plan.shard_map(
        body,
        in_specs=(qspec, qspec, qspec, mspec, _P_NONE(), qspec,
                  sspec, qspec) + _ix_specs(plan),
        out_specs=(qspec, qspec, qspec))
    dq, dk, dv = wrapped(q, k, v, mask, key_f32, out, lse, g,
                         *_ix_iotas(plan))
    return dq, dk, dv, jnp.zeros_like(mask), jnp.zeros_like(key_f32)


_flash_sharded_vjp.defvjp(_flash_sharded_fwd, _flash_sharded_bwd)


# ---------------------------------------------------------------------- #
# fused Bahdanau decoder step
# ---------------------------------------------------------------------- #
def _bahdanau_kernel(keys_ref, states_ref, mask_ref, pq_ref, v_ref,
                     ctx_ref, w_ref):
    # keys: (BT, T, A); pq: (BT, A); v: (1, A); states: (BT, T, D).
    # No batched einsums — Mosaic lowers broadcast-multiply+reduce,
    # not general dot_dimension_numbers.
    tanh_term = jnp.tanh(keys_ref[:] + pq_ref[:][:, None, :])
    energies = jnp.sum(tanh_term * v_ref[:][None, :, :], axis=-1)
    mask = mask_ref[:]
    energies = jnp.where(mask > 0, energies, NEG_INF)
    weights = jnp.exp(
        energies - jnp.max(energies, axis=1, keepdims=True))
    weights = weights * (mask > 0)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=1, keepdims=True), 1e-9)
    ctx_ref[:] = jnp.sum(weights[:, :, None] * states_ref[:], axis=1)
    w_ref[:] = weights


def _reference_bahdanau(keys, states, mask, projected_query,
                        similarity_v):
    energies = jnp.einsum(
        "bta,a->bt",
        jnp.tanh(keys + projected_query[:, None, :]), similarity_v)
    energies = jnp.where(mask > 0, energies, NEG_INF)
    weights = jnp.exp(
        energies - jnp.max(energies, axis=-1, keepdims=True))
    weights = weights * (mask > 0)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    context = jnp.einsum("bt,btd->bd", weights, states)
    return context, weights


def _fused_bahdanau_pallas(keys, states, mask, projected_query,
                           similarity_v, batch_tile: int):
    batch, time, att_dim = keys.shape
    state_dim = states.shape[-1]
    batch_tile = min(batch_tile, batch)
    pad = (-batch) % batch_tile
    if pad:
        keys = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
        states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        projected_query = jnp.pad(projected_query,
                                  ((0, pad), (0, 0)))
    padded = batch + pad

    context, weights = pl.pallas_call(
        _bahdanau_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((padded, state_dim), keys.dtype),
            jax.ShapeDtypeStruct((padded, time), keys.dtype),
        ),
        grid=(padded // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, time, att_dim),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, time, state_dim),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, time), lambda i: (i, 0)),
            pl.BlockSpec((batch_tile, att_dim), lambda i: (i, 0)),
            pl.BlockSpec((1, att_dim), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((batch_tile, state_dim), lambda i: (i, 0)),
            pl.BlockSpec((batch_tile, time), lambda i: (i, 0)),
        ),
        interpret=pallas_interpret(),
    )(keys, states, mask, projected_query, similarity_v[None, :])

    if pad:
        context = context[:batch]
        weights = weights[:batch]
    return context, weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_bahdanau_step(keys, states, mask, projected_query,
                        similarity_v, batch_tile: int = 8):
    """One decoder step: (context (B, D), weights (B, T)).

    ``keys`` (B, T, A) are the precomputed key projections,
    ``projected_query`` (B, A) the projected decoder state. Backward
    rematerializes through the pure-JAX reference."""
    return _fused_bahdanau_pallas(keys, states, mask, projected_query,
                                  similarity_v, batch_tile)


def _bahdanau_fwd(keys, states, mask, projected_query, similarity_v,
                  batch_tile):
    out = _fused_bahdanau_pallas(keys, states, mask, projected_query,
                                 similarity_v, batch_tile)
    return out, (keys, states, mask, projected_query, similarity_v)


def _bahdanau_bwd(batch_tile, residuals, grads):
    _, vjp = jax.vjp(_reference_bahdanau, *residuals)
    return vjp(grads)


fused_bahdanau_step.defvjp(_bahdanau_fwd, _bahdanau_bwd)


def bahdanau_step_dispatch(keys: jnp.ndarray, states: jnp.ndarray,
                           mask: jnp.ndarray,
                           projected_query: jnp.ndarray,
                           similarity_v: jnp.ndarray) -> jnp.ndarray:
    """Mesh-aware dispatch for the fused Bahdanau step: single device
    calls the kernel directly; a data(/model) mesh shard_map-wraps it
    per batch shard with ``similarity_v`` replicated (its cotangent is
    psummed over the manual axes by the shard_map transpose); a
    non-dividing batch or an ineligible mesh falls back to the pure
    reference."""
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is None:
        return fused_bahdanau_step(keys, states, mask,
                                   projected_query, similarity_v)
    if keys.shape[0] % plan.data:
        return _reference_bahdanau(keys, states, mask,
                                   projected_query, similarity_v)
    from jax.sharding import PartitionSpec as P

    def body(k_, s_, m_, pq_, v_):
        return fused_bahdanau_step(k_, s_, m_, pq_, v_)

    wrapped = plan.shard_map(
        body,
        in_specs=(P("data", None, None), P("data", None, None),
                  P("data", None), P("data", None), P()),
        out_specs=(P("data", None), P("data", None)))
    return wrapped(keys, states, mask, projected_query, similarity_v)
