"""Fused lineage decode-attention Pallas kernel.

The transformer's beam decode resolves beam ancestry in score space
(models/decoders/transformer.py decode_step_lineage): self-attention
scores are computed against ALL K beam slots and reduced through a
one-hot ancestry mask. As XLA einsums that is 5 small 5-D ops per
layer per step whose relayouts dominate the decode step (round-4
anatomy, docs/performance.md: the lineage block measured 2.25 ms at
W=12 vs a ~0.4 ms bandwidth floor — lowering-bound, not bandwidth:
bf16 caches changed nothing).

The kernel collapses the whole block into 2 MXU dots + a VPU softmax
per (batch, head), built on one identity:

    softmax over t of the ancestry-SELECTED scores
  = softmax over the flat (slot, time) axis of ALL scores + a bias
    that is 0 where slot == anc[k, t] (and t is inside the causal
    window) and -1e9 elsewhere,

because exactly one slot is valid per (k, t) — the invalid lanes
underflow to exact zeros, the same trick the dense masking uses. No
lineage reduction, no w_slot re-expansion, no 5-D relayouts.

Cache layout (kernel path only): time-major interleaved lanes,

    k_cache: (B, H, Dh, K*T)   lane index = t*K + j
    v_cache: (B, H, K*T, Dh)

so a static decode window ``win`` is a CONTIGUOUS prefix of
``win*K`` lanes (rounded up to the 128-lane grid) — the windowed
segments keep their early-step read savings. Per-step cache updates
write K contiguous lanes at offset ``step*K``.

Reference: nm/decoders/decoder.py beam-search attention semantics;
the pure-JAX twin below is golden-tested against the product einsum
path (tests/test_lineage_attention.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .kernel_config import pallas_interpret

NEG_INF = -1e9
LANE = 128

# lane budget for one (b,) grid step: H * Dh * L_win * 2 tensors must
# fit VMEM with headroom; beyond this the dispatch falls back to the
# einsum path (long-T decode)
_MAX_LANES = 2048


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def lane_window(win: int, beam: int, total: int) -> int:
    """Lanes to read for a ``win``-position window: win*K rounded up
    to the 128-lane grid, capped at the full K*T lane axis (the full
    axis is legal as a block dim even when not 128-aligned)."""
    lanes = -(-win * beam // LANE) * LANE
    return min(lanes, total)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads: int,
            scale: float):
    bias = bias_ref[0]                      # (K16, Lwin) f32
    for h in range(heads):
        q_h = q_ref[0, h]                   # (K16, Dh)
        k_h = k_ref[0, h]                   # (Dh, Lwin)
        s = jnp.dot(q_h.astype(k_h.dtype) * scale, k_h,
                    preferred_element_type=jnp.float32)
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        w = p / jnp.maximum(denom, 1e-20)
        ctx = jnp.dot(w.astype(v_ref.dtype), v_ref[0, h],
                      preferred_element_type=jnp.float32)
        o_ref[0, h] = ctx.astype(o_ref.dtype)


def lineage_bias(anc: jnp.ndarray, step, win: int, beam: int,
                 lanes: int, cache_len: int) -> jnp.ndarray:
    """(B, K16, lanes) f32 additive bias: 0 where lane (t*K + j) has
    j == anc[b, k, t], t <= step and t < win; -1e9 elsewhere. Built
    once per step in XLA and shared by every layer and head."""
    batch, beam_k, _ = anc.shape
    k16 = _pad8(beam_k)
    lane_ix = jnp.arange(lanes, dtype=jnp.int32)
    t_of = lane_ix // beam                 # cache position
    j_of = lane_ix % beam
    # anc gathered at t_of: (B, K, lanes)
    t_safe = jnp.minimum(t_of, cache_len - 1)
    anc_t = jnp.take(anc, t_safe, axis=2)
    ok = ((anc_t == j_of[None, None, :])
          & (t_of[None, None, :] <= step)
          & (t_of[None, None, :] < win))
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
    if k16 > beam_k:
        bias = jnp.pad(bias, ((0, 0), (0, k16 - beam_k), (0, 0)),
                       constant_values=NEG_INF)
    return bias


def lineage_attention_reference(q, k_cache, v_cache, bias,
                                beam: int) -> jnp.ndarray:
    """Pure-JAX twin of the kernel on the SAME kernel-layout operands
    (flat-softmax formulation): q (B, H, K16, Dh), k (B, H, Dh, L),
    v (B, H, L, Dh), bias (B, K16, L) -> (B, H, K16, Dh)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhkd,bhdl->bhkl", q.astype(k_cache.dtype) * scale,
                   k_cache,
                   preferred_element_type=jnp.float32)
    s = s + bias[:, None]
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhkl,bhld->bhkd", w.astype(v_cache.dtype),
                      v_cache, preferred_element_type=jnp.float32)


def lineage_attention(q, k_cache, v_cache, bias,
                      win_lanes: int) -> jnp.ndarray:
    """Fused lineage decode-attention.

    q: (B, H, K16, Dh) — beam-slot queries, slot axis padded to 8
    k_cache: (B, H, Dh, L)  with L = K*T time-major interleaved lanes
    v_cache: (B, H, L, Dh)
    bias: (B, K16, L) from :func:`lineage_bias`
    win_lanes: static lane prefix to read (:func:`lane_window`)

    Returns (B, H, K16, Dh) f32 contexts.
    """
    batch, heads, k16, head_dim = q.shape
    total = k_cache.shape[-1]
    win_lanes = min(win_lanes, total)
    scale = 1.0 / (head_dim ** 0.5)

    # the window is the block spec's lane prefix of the FULL cache —
    # Pallas fetches only the block, so no pre-slice copy ever hits
    # HBM (bias is built at win_lanes size by the caller)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((batch, heads, k16, head_dim),
                                       jnp.float32),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, heads, k16, head_dim),
                         lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, heads, head_dim, win_lanes),
                         lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, heads, win_lanes, head_dim),
                         lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, k16, win_lanes), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, heads, k16, head_dim),
                               lambda b: (b, 0, 0, 0)),
        interpret=pallas_interpret(),
    )(q, k_cache, v_cache, bias)


def lineage_kernel_ok(beam: int, heads: int, head_dim: int,
                      cache_len: int) -> bool:
    """Shape gate for the kernel path: the windowed lane axis must fit
    the per-step VMEM budget and the head dim must be lane-legal."""
    lanes = beam * cache_len
    if lanes > _MAX_LANES:
        return False
    if head_dim % 128 != 0 and 128 % head_dim != 0:
        return False
    return True
