"""Ring-attention context parallelism over a 'context' mesh axis.

The reference transformer (nm/encoders/transformer.py,
nm/decoders/transformer.py) is single-device with vanilla O(T²)
attention; SURVEY.md §6 explicitly reserves a sequence axis in the
mesh design for this extension. Context parallelism shards the TIME
axis of every attention operand over the 'context' mesh axis: each
device holds T/C queries and T/C keys/values, the K/V (+key-mask)
blocks rotate around the ring via ``lax.ppermute``, and every device
folds each visiting block into a flash-style online softmax (running
block max / normalizer / context accumulator). No device ever holds
more than a (T/C, T/C) score tile, so per-device attention memory
*and* activation memory drop by the context degree — the lever that
lets one global batch train on sequences C× longer than a single
chip's HBM allows.

Two block schedules:

- **Contiguous** (non-causal, and the causal fallback): device ``i``
  owns query positions ``[i·T/C, (i+1)·T/C)``; the local block is
  folded first, then the ring issues exactly C−1 rotations
  (rotate-then-fold — the last fold's block is never re-rotated).
  Causality rides global block offsets, so blocks strictly above the
  diagonal are positionally annihilated but still *computed*.
- **Zigzag** (causal self-attention default): each device owns TWO
  half-blocks of T/2C queries — thin chunks ``i`` and ``2C−1−i`` —
  so causal work balances exactly: after the peeled diagonal step
  (3 thin folds) every ring step folds exactly 2 fully-*valid* thin
  blocks per device, ~halving the causal ring's FLOPs (the contiguous
  schedule wastes the fully-masked above-diagonal blocks). The
  contiguous→zigzag exchange is two ppermutes per operand at entry
  and two on the output.

Attention dropout is supported inside the ring: the keep-mask for the
(global q-chunk, global kv-chunk) block is drawn from
``fold_in(rng, q_chunk · n_chunks + kv_chunk)``, so every device
samples the identical mask for the same global block regardless of
where the ring schedule computes it. Dropout multiplies the
*unnormalized* exp terms while the running normalizer accumulates the
undropped sum — exactly ``softmax → drop/keep_prob → @V`` as the
dense path (ops/attention.dot_product_attention) computes it.

Only the 'context' axis is manual inside the shard_map
(``axis_names={'context'}``): batch sharding over 'data', Megatron
'model'-axis head sharding, and FSDP parameter layouts all stay
GSPMD-managed inside the body, so context parallelism composes with
DP/TP/ZeRO transparently.

Registry pattern mirrors parallel/pipeline.py / ops/sharding.py:
``TPUManager(num_context_shards=C)`` builds a
('data', 'context'[, 'model']) mesh and registers it here;
``ops/attention.multi_head_attention`` routes full-sequence masked
attention through :func:`ring_attention` when eligible (both time
axes divide C, no custom bias), and ``ops/sharding.constrain_sequence``
keeps the residual stream's time axis sharded over 'context' between
blocks.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

NEG_INF = -1e9

_CTX_MESH = None


def enable_context_parallel(mesh: object) -> None:
    """Register the mesh whose 'context' axis attention time should
    shard over (done by TPUManager when constructed with
    ``num_context_shards > 1``)."""
    global _CTX_MESH
    _CTX_MESH = mesh


def disable_context_parallel() -> None:
    global _CTX_MESH
    _CTX_MESH = None


def context_parallel_mesh() -> Optional[Any]:
    return _CTX_MESH


def ring_eligible(q_len: int, kv_len: int) -> bool:
    """True when the registered context mesh can shard these time
    axes. Decode steps (q_len=1) and ragged bucket tails fall back to
    the dense path — GSPMD just gathers the time axis there, so
    correctness never depends on eligibility."""
    if _CTX_MESH is None:
        return False
    cp = _CTX_MESH.shape.get("context", 1)
    if cp < 2:
        return False
    return q_len % cp == 0 and kv_len % cp == 0


def ring_dropout_eligible() -> bool:
    """Attention dropout inside the ring needs partial-auto
    ``jax.shard_map`` (the fully-manual fallback would draw the
    keep-mask at per-data-shard batch shapes, repeating masks across
    data shards)."""
    import jax
    return hasattr(jax, "shard_map")


def _block_keep(rng, q_chunk, kv_chunk, n_chunks, keep_prob, shape):
    """Keep-mask for one global (q-chunk, kv-chunk) attention block.
    Counter-based: the key depends only on the GLOBAL chunk indices,
    so any device computing this block — at any ring step, under any
    schedule — draws the same bits (VERDICT r2 item 4a)."""
    import jax
    key = jax.random.fold_in(rng, q_chunk * n_chunks + kv_chunk)
    return jax.random.bernoulli(key, keep_prob, shape)


def _fold(acc, m, l, q, kb, vb, mb, scale, pos_bias=None, keep=None,
          keep_prob=1.0):
    """Fold one visiting K/V block into the online softmax.

    ``pos_bias`` is an optional (Tq_blk, Tk_blk) additive causal bias;
    ``keep`` an optional dropout keep-mask over the block's weights.
    The normalizer accumulates the UNdropped probability mass (dense
    semantics: dropout applies after softmax)."""
    import jax
    import jax.numpy as jnp

    # identical MXU semantics to ops/attention.dot_product_attention:
    # operand-dtype multiply, f32 accumulation
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(kb.dtype), kb,
        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mb > 0, 0.0, NEG_INF)[:, None, None, :]
    if pos_bias is not None:
        bias = bias + pos_bias[None, None, :, :]
    scores = scores + bias
    # online softmax: a fully-masked visiting block tops out at
    # ~NEG_INF, so once any valid block has been folded in its
    # correction factor exp(-1e9) flushes to exactly 0 in f32 and
    # the masked mass is annihilated — same fixed point as the
    # dense softmax's additive-bias masking
    new_m = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    corr = jnp.exp(m - new_m)
    p = jnp.exp(scores - new_m)
    new_l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = p * keep / keep_prob if keep is not None else p
    new_acc = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", pv.astype(vb.dtype), vb,
        preferred_element_type=jnp.float32)
    return new_acc, new_m, new_l


def _causal_pos_bias(q_pos, k_pos):
    import jax.numpy as jnp
    return jnp.where(q_pos[:, None] >= k_pos[None, :], 0.0, NEG_INF)


def _init_osm(q, v_dim):
    import jax.numpy as jnp
    acc = jnp.zeros(q.shape[:3] + (v_dim,), jnp.float32)
    m = jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32)
    l = jnp.zeros(q.shape[:3] + (1,), jnp.float32)
    return acc, m, l


def _ring_body(q, k, v, mask, idx, *, cp: int, causal: bool,
               dropout_rng=None, keep_prob: float = 1.0):
    """Contiguous per-device ring schedule. Inside the shard_map only
    the time axis is manual: q (B, H, Tq/C, Dh), k/v (B, H, Tk/C, Dh),
    mask (B, Tk/C) are the local blocks. The local (diagonal) block is
    folded before the scan, so only C−1 ppermute rotations are issued
    (ADVICE r2: the old fold-then-rotate scan wasted one ring hop per
    attention call on a result nothing read — XLA cannot DCE a
    collective inside scan)."""
    import jax
    import jax.numpy as jnp

    # the shard index rides the iota operand, NOT axis_index: inside
    # a nested wrap (CP x PP) axis_index emits a manual computation
    # that re-binds the outer axes and fails MLIR verification (the
    # same workaround as ops/pallas_attention's sharded dropout fold)
    my = idx[0]
    tq, tk = q.shape[2], k.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    perm = [(i, (i + 1) % cp) for i in range(cp)]
    q_pos = my * tq + jnp.arange(tq)

    def fold_block(carry_osm, j, kb, vb, mb):
        pos = (_causal_pos_bias(q_pos, j * tk + jnp.arange(tk))
               if causal else None)
        keep = (_block_keep(dropout_rng, my, j, cp, keep_prob,
                            q.shape[:2] + (tq, tk))
                if dropout_rng is not None else None)
        return _fold(*carry_osm, q, kb, vb, mb, scale, pos, keep,
                     keep_prob)

    # peeled step 0: the local (diagonal) block, no rotation yet
    osm = fold_block(_init_osm(q, v.shape[-1]), my, k, v, mask)

    def step(carry, s):
        kb, vb, mb, acc, m, l = carry
        kb = jax.lax.ppermute(kb, "context", perm)
        vb = jax.lax.ppermute(vb, "context", perm)
        mb = jax.lax.ppermute(mb, "context", perm)
        # after s forward rotations device `my` holds the block that
        # originated on device (my - s) mod cp
        j = (my - s) % cp
        acc, m, l = fold_block((acc, m, l), j, kb, vb, mb)
        return (kb, vb, mb, acc, m, l), None

    (_, _, _, acc, _, row_sum), _ = jax.lax.scan(
        step, (k, v, mask) + osm, jnp.arange(1, cp))
    return (acc / jnp.maximum(row_sum, 1e-20)).astype(v.dtype)


def _zz_exchange(x, cp: int, axis: int, my):
    """Contiguous → zigzag re-shard of one operand's local block:
    device ``d`` holds global thin chunks (2d, 2d+1) of size T/2C and
    must end with chunks (d, 2C−1−d). Thin chunk ``c``'s zigzag owner
    is ``c`` if ``c < C`` else ``2C−1−c``; routing the low halves and
    the high halves separately makes each hop a valid permutation.
    Returns (low_chunk, high_chunk)."""
    import jax
    import jax.numpy as jnp

    def zz(c):
        return c if c < cp else 2 * cp - 1 - c

    t = x.shape[axis] // 2
    low = jax.lax.slice_in_dim(x, 0, t, axis=axis)
    high = jax.lax.slice_in_dim(x, t, 2 * t, axis=axis)
    perm_a = [(d, zz(2 * d)) for d in range(cp)]
    perm_b = [(d, zz(2 * d + 1)) for d in range(cp)]
    recv_a = jax.lax.ppermute(low, "context", perm_a)
    recv_b = jax.lax.ppermute(high, "context", perm_b)
    # device i's zigzag-low slot is chunk i: even chunks travel via
    # perm_a, odd via perm_b
    even = (my % 2 == 0)
    lo = jnp.where(even, recv_a, recv_b)
    hi = jnp.where(even, recv_b, recv_a)
    return lo, hi


def _zz_unexchange(lo, hi, cp: int, axis: int, my):
    """Inverse of :func:`_zz_exchange`: send each zigzag slot back to
    the contiguous owner and reassemble the local (2t) block."""
    import jax
    import jax.numpy as jnp

    def zz(c):
        return c if c < cp else 2 * cp - 1 - c

    inv_a = [(zz(2 * d), d) for d in range(cp)]
    inv_b = [(zz(2 * d + 1), d) for d in range(cp)]
    even = (my % 2 == 0)
    send_a = jnp.where(even, lo, hi)   # the chunk that arrived via A
    send_b = jnp.where(even, hi, lo)
    back_low = jax.lax.ppermute(send_a, "context", inv_a)
    back_high = jax.lax.ppermute(send_b, "context", inv_b)
    return jnp.concatenate([back_low, back_high], axis=axis)


def _zigzag_body(q, k, v, mask, idx, *, cp: int, dropout_rng=None,
                 keep_prob: float = 1.0):
    """Balanced causal ring (VERDICT r2 item 4b). Device ``i`` owns
    query thin chunks ``i`` and ``2C−1−i``; at ring step ``s`` it
    holds the K/V thin-chunk pair (j, 2C−1−j), j = (i−s) mod C, and
    folds exactly the *valid* thin blocks:

    - step 0 (peeled, no rotation): (q_i, kv_i) triangle,
      (q_hi, kv_i) full, (q_hi, kv_hi) triangle — 3 thin folds;
    - step s>0: (q_hi, kv_j) is always strictly below the diagonal;
      the second fold selects (q_lo, kv_j) when j<i else
      (q_hi, kv_hij) — both strictly below — 2 thin folds.

    Every device folds the same count at every step, so causal FLOPs
    are ~half the contiguous schedule's and per-step ring waits are
    balanced. Dropout keys use global THIN-chunk indices (n_chunks =
    2C), so the mask per global block is schedule-independent."""
    import jax
    import jax.numpy as jnp

    my = idx[0]  # iota operand, not axis_index — see _ring_body
    t = q.shape[2] // 2
    scale = 1.0 / math.sqrt(q.shape[-1])
    n_chunks = 2 * cp
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    q_lo, q_hi = _zz_exchange(q, cp, axis=2, my=my)
    k_lo, k_hi = _zz_exchange(k, cp, axis=2, my=my)
    v_lo, v_hi = _zz_exchange(v, cp, axis=2, my=my)
    m_lo, m_hi = _zz_exchange(mask, cp, axis=1, my=my)

    lo_id = my                 # global thin-chunk id of the low slot
    hi_id = 2 * cp - 1 - my
    pos = jnp.arange(t)

    def fold_thin(osm, qb, q_id, kb, vb, mb, kv_id, triangle):
        pos_bias = (_causal_pos_bias(q_id * t + pos, kv_id * t + pos)
                    if triangle else None)
        keep = (_block_keep(dropout_rng, q_id, kv_id, n_chunks,
                            keep_prob, qb.shape[:2] + (t, t))
                if dropout_rng is not None else None)
        return _fold(*osm, qb, kb, vb, mb, scale, pos_bias, keep,
                     keep_prob)

    # peeled diagonal step: 3 valid thin folds (q_lo × kv_hi is fully
    # above the diagonal — never computed)
    osm_lo = fold_thin(_init_osm(q_lo, v.shape[-1]), q_lo, lo_id,
                       k_lo, v_lo, m_lo, lo_id, True)
    osm_hi = fold_thin(_init_osm(q_hi, v.shape[-1]), q_hi, hi_id,
                       k_lo, v_lo, m_lo, lo_id, False)
    osm_hi = fold_thin(osm_hi, q_hi, hi_id, k_hi, v_hi, m_hi, hi_id,
                       True)

    def step(carry, s):
        klo, vlo, mlo, khi, vhi, mhi, osm_lo, osm_hi = carry
        klo = jax.lax.ppermute(klo, "context", perm)
        vlo = jax.lax.ppermute(vlo, "context", perm)
        mlo = jax.lax.ppermute(mlo, "context", perm)
        khi = jax.lax.ppermute(khi, "context", perm)
        vhi = jax.lax.ppermute(vhi, "context", perm)
        mhi = jax.lax.ppermute(mhi, "context", perm)
        j = (my - s) % cp
        j_hi = 2 * cp - 1 - j
        # fold 1: q_hi × kv_lo — always strictly below the diagonal
        osm_hi = fold_thin(osm_hi, q_hi, hi_id, klo, vlo, mlo, j,
                           False)
        # fold 2: j<my → (q_lo × kv_lo); j>my → (q_hi × kv_hi);
        # both strictly below the diagonal, selected by operand
        lo_side = j < my
        qb = jnp.where(lo_side, q_lo, q_hi)
        q_id = jnp.where(lo_side, lo_id, hi_id)
        kb = jnp.where(lo_side, klo, khi)
        vb = jnp.where(lo_side, vlo, vhi)
        mb = jnp.where(lo_side, mlo, mhi)
        kv_id = jnp.where(lo_side, j, j_hi)
        osm_in = jax.tree_util.tree_map(
            lambda a, b: jnp.where(lo_side, a, b), osm_lo, osm_hi)
        osm_out = fold_thin(osm_in, qb, q_id, kb, vb, mb, kv_id,
                            False)
        osm_lo = jax.tree_util.tree_map(
            lambda new, old: jnp.where(lo_side, new, old),
            osm_out, osm_lo)
        osm_hi = jax.tree_util.tree_map(
            lambda new, old: jnp.where(lo_side, old, new),
            osm_out, osm_hi)
        return (klo, vlo, mlo, khi, vhi, mhi, osm_lo, osm_hi), None

    carry = (k_lo, v_lo, m_lo, k_hi, v_hi, m_hi, osm_lo, osm_hi)
    (_, _, _, _, _, _, osm_lo, osm_hi), _ = jax.lax.scan(
        step, carry, jnp.arange(1, cp))

    def finish(osm):
        acc, _, row_sum = osm
        return (acc / jnp.maximum(row_sum, 1e-20)).astype(v.dtype)

    return _zz_unexchange(finish(osm_lo), finish(osm_hi), cp, axis=2,
                          my=my)


def ring_attention(q, k, v, key_mask, causal: bool = False,
                   dropout_rng=None, dropout_keep_prob: float = 1.0,
                   schedule: str = "auto"):
    """Context-parallel multi-head attention core.

    Args:
      q: (B, H, Tq, Dh) queries; Tq % C == 0.
      k, v: (B, H, Tk, Dh); Tk % C == 0.
      key_mask: (B, Tk) float validity mask (f32 per the compute
        policy's mask rule).
      causal: apply the global causal triangle (self-attention).
      dropout_rng / dropout_keep_prob: attention dropout, applied to
        the softmax weights blockwise with counter-based keys (see
        module docstring); requires partial-auto ``jax.shard_map``.

    Returns (B, H, Tq, Dh) context in v's dtype, equal to
    ``dot_product_attention`` with the same mask/causal bias (and the
    blockwise dropout masks) up to online-softmax reassociation
    (~f32 epsilon).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = _CTX_MESH
    cp = mesh.shape["context"]
    if dropout_rng is not None and dropout_keep_prob >= 1.0:
        dropout_rng = None
    time_spec = P(None, None, "context", None)
    # zigzag balances causal self-attention; needs Tq == Tk and an
    # even per-device block so thin chunks split cleanly
    zigzag = (causal and q.shape[2] == k.shape[2]
              and (q.shape[2] // cp) % 2 == 0)
    if schedule == "contiguous":   # A/B + flop-balance tests
        zigzag = False
    elif schedule == "zigzag" and not zigzag:
        raise ValueError("zigzag needs causal, Tq == Tk, and an even "
                         "per-device block")
    if zigzag:
        body = functools.partial(_zigzag_body, cp=cp,
                                 dropout_rng=dropout_rng,
                                 keep_prob=dropout_keep_prob)
    else:
        body = functools.partial(_ring_body, cp=cp, causal=causal,
                                 dropout_rng=dropout_rng,
                                 keep_prob=dropout_keep_prob)
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        # partial-auto: ONLY 'context' is manual; 'data' batch
        # sharding and any 'model' head sharding stay GSPMD-managed.
        # Inside an outer manual region (a GPipe stage body under
        # CP x PP) the concrete mesh is not addressable — nest over
        # the abstract mesh instead, exactly like
        # ops/kernel_config.spmd_wrap_plan's nested kernel wraps.
        from ..ops.kernel_config import _manual_axes
        wrap_mesh = mesh
        if _manual_axes():
            wrap_mesh = jax.sharding.get_abstract_mesh()
        wrapped = sm(body, mesh=wrap_mesh,
                     in_specs=(time_spec, time_spec, time_spec,
                               P(None, "context"), P("context")),
                     out_specs=time_spec,
                     axis_names={"context"}, check_vma=False)
    else:  # older jax: fully-manual fallback (no TP composition,
        # no ring dropout — see ring_dropout_eligible)
        from jax.experimental.shard_map import shard_map
        dp = "data" if "data" in mesh.shape else None
        qspec = P(dp, None, "context", None)
        wrapped = shard_map(body, mesh=mesh,
                            in_specs=(qspec, qspec, qspec,
                                      P(dp, "context"), P("context")),
                            out_specs=qspec, check_rep=False)
    idx = jnp.arange(cp, dtype=jnp.int32)
    return wrapped(q, k, v, key_mask, idx)


def blockwise_dropout_mask(rng, keep_prob: float, batch: int,
                           heads: int, tq: int, tk: int, cp: int,
                           causal: bool):
    """Assemble the FULL (B, H, Tq, Tk) keep-mask the ring's blockwise
    scheme draws, for dense-reference equivalence tests: the zigzag
    schedule (causal, thin chunks of T/2C) and the contiguous schedule
    (chunks of T/C) place each global block's bernoulli draw at its
    global offsets."""
    import jax.numpy as jnp

    zigzag = (causal and tq == tk and (tq // cp) % 2 == 0)
    n_chunks = 2 * cp if zigzag else cp
    bq = tq // n_chunks
    bk = tk // n_chunks
    rows = []
    for qc in range(n_chunks):
        row = [_block_keep(rng, qc, kc, n_chunks, keep_prob,
                           (batch, heads, bq, bk))
               for kc in range(n_chunks)]
        rows.append(jnp.concatenate(row, axis=3))
    return jnp.concatenate(rows, axis=2)
