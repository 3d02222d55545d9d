"""Fused beam-selection reductions (SURVEY.md §8.1 kernel (c)).

The hierarchical beam-step selector
(models/decoders/beam_search_decoder.py `_select_hier`) needs, per
step, exactly two reductions over the (B·K, V) logits:

- ``rowmax``: the maximum of every 128-lane row (V viewed as R×128) —
  stage-1 candidates;
- ``lse``: the log-sum-exp of every beam's full vocab row — turns raw
  logits into log-probs lazily, for the selected candidates only.

XLA computes these in separate passes and lowers the (…, R)-shaped
lane reduction through an unfavourable layout (measured ~0.5 ms/step
at (640, 30080) on v5e vs ~0.15 ms for the same bytes reduced to
scalars). The Pallas kernel below does both in ONE read of the logits:
each grid cell holds 8 beam rows in VMEM and emits their R row maxima
and per-row logsumexp.

A pure-JAX twin (`_rowmax_lse_reference`) defines the semantics; the
kernel is golden-tested against it (tests/test_pallas.py) and
`bench.py` asserts kernel-vs-XLA agreement on the real TPU at bench
time. Selection stays exact: both stages consume these reductions
identically on either path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .kernel_config import pallas_interpret, use_pallas

LANE = 128
SUBLANES = 8
_NEG = -3.4e38  # ~f32 min; padding that loses every comparison


def _rowmax_lse_reference(x: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-JAX semantics. x: (N, R*128) f32.
    Returns (rowmax (N, R), lse (N,))."""
    n, vp = x.shape
    r = vp // LANE
    rowmax = jnp.max(x.reshape(n, r, LANE), axis=2)
    lse = jax.nn.logsumexp(x, axis=1)
    return rowmax, lse


def _kernel(x_ref, rowmax_ref, lse_ref, *, r: int, r_pad: int):
    x = x_ref[:]                                   # (8, R*128)
    m = jnp.max(x, axis=1, keepdims=True)          # (8, 1)
    s = jnp.sum(jnp.exp(x - m), axis=1, keepdims=True)
    lse = m + jnp.log(s)
    lse_ref[:] = jnp.broadcast_to(lse, (SUBLANES, LANE))

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, r_pad), 1)
    acc = jnp.full((SUBLANES, r_pad), _NEG, jnp.float32)
    for i in range(r):  # static unroll; r is a compile-time constant
        mi = jnp.max(x[:, i * LANE:(i + 1) * LANE], axis=1,
                     keepdims=True)
        acc = jnp.where(lane == i, mi, acc)
    rowmax_ref[:] = acc


def _rowmax_lse_pallas(x: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, vp = x.shape
    r = vp // LANE
    r_pad = -(-r // LANE) * LANE
    grid = n // SUBLANES
    rowmax, lse = pl.pallas_call(
        partial(_kernel, r=r, r_pad=r_pad),
        grid=(grid,),
        in_specs=[pl.BlockSpec((SUBLANES, vp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((SUBLANES, r_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        ),
        interpret=pallas_interpret(),
    )(x)
    return rowmax[:, :r], lse[:, 0]


def _topk_reference(x: jnp.ndarray, k: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jax.lax.top_k(x, k)


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, n: int):
    x = x_ref[:].astype(jnp.float32)             # (8, n_pad)
    n_pad = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, n_pad), 1)
    x = jnp.where(lane < n, x, _NEG)             # mask padding
    out_lane = jax.lax.broadcasted_iota(
        jnp.int32, (SUBLANES, LANE), 1)
    vals = jnp.full((SUBLANES, LANE), _NEG, jnp.float32)
    idxs = jnp.zeros((SUBLANES, LANE), jnp.int32)
    big = jnp.int32(n_pad)
    for i in range(k):  # static unroll; k is small (beam size)
        m = jnp.max(x, axis=1, keepdims=True)            # (8, 1)
        # lowest index among ties — lax.top_k semantics
        where_idx = jnp.where(x == m, lane, big)
        arg = jnp.min(where_idx, axis=1, keepdims=True)  # (8, 1)
        vals = jnp.where(out_lane == i, m, vals)
        idxs = jnp.where(out_lane == i, arg, idxs)
        x = jnp.where(lane == arg, _NEG, x)
    vals_ref[:] = vals
    idx_ref[:] = idxs


def _topk_pallas(x: jnp.ndarray, k: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x.shape
    n_pad = -(-n // LANE) * LANE
    b_pad = -(-b // SUBLANES) * SUBLANES
    if (b_pad, n_pad) != (b, n):
        x = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n)),
                    constant_values=_NEG)
    grid = b_pad // SUBLANES
    vals, idxs = pl.pallas_call(
        partial(_topk_kernel, k=k, n=n),
        grid=(grid,),
        in_specs=[pl.BlockSpec((SUBLANES, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, LANE), jnp.int32),
        ),
        interpret=pallas_interpret(),
    )(x)
    return vals[:b, :k], idxs[:b, :k]


def small_topk(x: jnp.ndarray, k: int, force_pallas: bool = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the trailing axis of (B, n) for small n
    (≤ ~4k) and small k (≤ 64) — iterative masked extraction in VMEM.

    ``lax.top_k`` at these shapes costs ~0.15 ms/call on v5e (it pays
    a sort-like lowering); this kernel is a few microseconds. Matches
    lax.top_k exactly, including lowest-index tie-breaking.
    """
    if k > 64 or x.shape[1] > 8192:
        return _topk_reference(x, k)
    enabled = use_pallas() if force_pallas is None else force_pallas
    if not enabled or x.dtype != jnp.float32:
        return _topk_reference(x, k)
    from .kernel_config import spmd_wrap_mesh
    mesh = spmd_wrap_mesh()
    if mesh is not None:
        # multi-device data(/model) mesh: run the kernel per data
        # shard of the row axis (kernel_config.note_mesh rationale); the
        # kernel pads rows internally so only divisibility gates
        if x.shape[0] % mesh.shape.get("data", 1):
            return _topk_reference(x, k)
        from jax.sharding import PartitionSpec as P

        def body(x_):
            return _topk_pallas(x_, k)

        wrapped = jax.shard_map(
            body, mesh=mesh, in_specs=(P("data", None),),
            out_specs=(P("data", None), P("data", None)),
            check_vma=False)
        return wrapped(x)
    return _topk_pallas(x, k)


def rowmax_lse(x: jnp.ndarray, force_pallas: bool = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-128-lane-row maxima + per-row logsumexp of (N, R·128) f32.

    Dispatches to the fused Pallas kernel on real TPUs (one HBM read),
    falling back to the pure-JAX reference elsewhere. N must be a
    multiple of 8 and the trailing dim a multiple of 128 for the
    kernel; other shapes take the reference path.
    """
    n, vp = x.shape
    enabled = use_pallas() if force_pallas is None else force_pallas
    if (not enabled or n % SUBLANES != 0 or vp % LANE != 0
            or x.dtype != jnp.float32):
        return _rowmax_lse_reference(x)
    from .kernel_config import spmd_wrap_mesh
    mesh = spmd_wrap_mesh()
    if mesh is not None:
        # per-data-shard rows must stay a multiple of the kernel's
        # 8-row sublane grid
        dp = mesh.shape.get("data", 1)
        if n % dp or (n // dp) % SUBLANES:
            return _rowmax_lse_reference(x)
        from jax.sharding import PartitionSpec as P
        wrapped = jax.shard_map(
            _rowmax_lse_pallas, mesh=mesh, in_specs=(P("data", None),),
            out_specs=(P("data", None), P("data")),
            check_vma=False)
        return wrapped(x)
    return _rowmax_lse_pallas(x)
