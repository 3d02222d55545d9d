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

Causality rides global block offsets: device ``i`` owns query
positions ``[i·T/C, (i+1)·T/C)``; a visiting K/V block is masked by
position, so blocks strictly above the diagonal contribute nothing
and the diagonal block applies the in-block triangle. The schedule is
static (every device folds all C blocks); the masked upper-triangle
blocks are wasted FLOPs on half the ring on average — the standard
fix (zigzag/striped block assignment) is a layout change left for a
measured-need day, since the feature's first job is memory scaling.

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
axes divide C, no attention dropout, no custom bias), and
``ops/sharding.constrain_sequence`` keeps the residual stream's time
axis sharded over 'context' between blocks.
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


def _ring_body(q, k, v, mask, *, cp: int, causal: bool):
    """Per-device ring schedule. Inside the shard_map only the time
    axis is manual: q (B, H, Tq/C, Dh), k/v (B, H, Tk/C, Dh),
    mask (B, Tk/C) are the local blocks."""
    import jax
    import jax.numpy as jnp

    my = jax.lax.axis_index("context")
    tq, tk = q.shape[2], k.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    perm = [(i, (i + 1) % cp) for i in range(cp)]
    q_pos = my * tq + jnp.arange(tq)

    acc = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    row_max = jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32)
    row_sum = jnp.zeros(q.shape[:3] + (1,), jnp.float32)

    def step(carry, s):
        kb, vb, mb, acc, m, l = carry
        # after s forward rotations device `my` holds the block that
        # originated on device (my - s) mod cp
        j = (my - s) % cp
        # identical MXU semantics to ops/attention.dot_product_attention:
        # operand-dtype multiply, f32 accumulation
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(kb.dtype), kb,
            preferred_element_type=jnp.float32) * scale
        bias = jnp.where(mb > 0, 0.0, NEG_INF)[:, None, None, :]
        if causal:
            k_pos = j * tk + jnp.arange(tk)
            bias = bias + jnp.where(
                q_pos[:, None] >= k_pos[None, :], 0.0,
                NEG_INF)[None, None, :, :]
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
        new_acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        kb = jax.lax.ppermute(kb, "context", perm)
        vb = jax.lax.ppermute(vb, "context", perm)
        mb = jax.lax.ppermute(mb, "context", perm)
        return (kb, vb, mb, new_acc, new_m, new_l), None

    (_, _, _, acc, _, row_sum), _ = jax.lax.scan(
        step, (k, v, mask, acc, row_max, row_sum), jnp.arange(cp))
    return (acc / jnp.maximum(row_sum, 1e-20)).astype(v.dtype)


def ring_attention(q, k, v, key_mask, causal: bool = False):
    """Context-parallel multi-head attention core.

    Args:
      q: (B, H, Tq, Dh) queries; Tq % C == 0.
      k, v: (B, H, Tk, Dh); Tk % C == 0.
      key_mask: (B, Tk) float validity mask (f32 per the compute
        policy's mask rule).
      causal: apply the global causal triangle (self-attention).

    Returns (B, H, Tq, Dh) context in v's dtype, equal to
    ``dot_product_attention`` with the same mask/causal bias up to
    online-softmax reassociation (~f32 epsilon).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    mesh = _CTX_MESH
    cp = mesh.shape["context"]
    time_spec = P(None, None, "context", None)
    body = functools.partial(_ring_body, cp=cp, causal=causal)
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        # partial-auto: ONLY 'context' is manual; 'data' batch
        # sharding and any 'model' head sharding stay GSPMD-managed
        wrapped = sm(body, mesh=mesh,
                     in_specs=(time_spec, time_spec, time_spec,
                               P(None, "context")),
                     out_specs=time_spec,
                     axis_names={"context"}, check_vma=False)
    else:  # older jax: fully-manual fallback (no TP composition)
        from jax.experimental.shard_map import shard_map
        dp = "data" if "data" in mesh.shape else None
        qspec = P(dp, None, "context", None)
        wrapped = shard_map(body, mesh=mesh,
                            in_specs=(qspec, qspec, qspec,
                                      P(dp, "context")),
                            out_specs=qspec, check_rep=False)
    return wrapped(q, k, v, key_mask)
