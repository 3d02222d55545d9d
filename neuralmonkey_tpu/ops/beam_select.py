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

from functools import lru_cache, partial
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


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, n: int,
                 rows: int):
    x = x_ref[:].astype(jnp.float32)             # (rows, n_pad)
    n_pad = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
    x = jnp.where(lane < n, x, _NEG)             # mask padding
    out_lane = jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANE), 1)
    vals = jnp.full((rows, LANE), _NEG, jnp.float32)
    idxs = jnp.zeros((rows, LANE), jnp.int32)
    big = jnp.int32(n_pad)
    for i in range(k):  # static unroll; k is small (beam size)
        m = jnp.max(x, axis=1, keepdims=True)            # (rows, 1)
        # lowest index among ties — lax.top_k semantics
        where_idx = jnp.where(x == m, lane, big)
        arg = jnp.min(where_idx, axis=1, keepdims=True)  # (rows, 1)
        vals = jnp.where(out_lane == i, m, vals)
        idxs = jnp.where(out_lane == i, arg, idxs)
        x = jnp.where(lane == arg, _NEG, x)
    vals_ref[:] = vals
    idx_ref[:] = idxs


def _topk_rows_per_cell(b_pad: int, n_pad: int) -> int:
    """Rows per grid cell: as many as fit VMEM. The k extraction
    passes are serial dependency chains; wider tiles amortize the
    VPU op latency across more rows (measured ~4x at the bench's
    stage-1 shape vs 8-row cells), so prefer ONE cell when it fits."""
    budget = 6 * 1024 * 1024
    rows = b_pad
    while rows > SUBLANES and (b_pad % rows or rows * n_pad * 4
                               > budget):
        rows -= SUBLANES
    return max(rows, SUBLANES)


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
    rows = _topk_rows_per_cell(b_pad, n_pad)
    grid = b_pad // rows
    vals, idxs = pl.pallas_call(
        partial(_topk_kernel, k=k, n=n, rows=rows),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda i: (i, 0),
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
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is not None:
        # multi-device mesh: run the kernel per data shard of the row
        # axis (kernel_config.spmd_wrap_plan rationale); the kernel
        # pads rows internally so only divisibility gates
        if x.shape[0] % plan.data:
            return _topk_reference(x, k)
        from jax.sharding import PartitionSpec as P

        def body(x_):
            return _topk_pallas(x_, k)

        wrapped = plan.shard_map(
            body, in_specs=(P("data", None),),
            out_specs=(P("data", None), P("data", None)))
        return wrapped(x)
    return _topk_pallas(x, k)


def _fused_logits_rowmax_lse_reference(
        x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-JAX semantics of the fused logit-projection epilogue.
    x: (N, D) f32, w: (D, Vp) f32, b: (1, Vp) f32, Vp = R·128.
    Returns (logits (N, Vp), rowmax (N, R), lse (N,))."""
    logits = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    rowmax, lse = _rowmax_lse_reference(logits)
    return logits, rowmax, lse


def _fused_kernel(x_ref, w_ref, b_ref, out_ref, rowmax_ref, lse_ref,
                  m_s, s_s, *, gpv: int, n_vtiles: int, r_pad: int,
                  out_3d: bool = False):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        rowmax_ref[:] = jnp.full(rowmax_ref.shape, _NEG, jnp.float32)
        m_s[:] = jnp.full(m_s.shape, _NEG, jnp.float32)
        s_s[:] = jnp.zeros(s_s.shape, jnp.float32)

    if out_3d:
        # window-tiled logits: out_ref is (nt, gpv, 128). One dot per
        # 128-lane group — the full (nt, vt) tile never materializes
        # (it exceeds scoped VMEM alongside the out block at the bench
        # tiling), and each group's rowmax/lse folds directly.
        nt = x_ref.shape[0]
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (nt, r_pad), 1)
        acc = rowmax_ref[:]
        m_new = m_s[:, :1]
        s_new = s_s[:, :1]
        for g in range(gpv):  # static unroll; gpv groups per tile
            tg = (jnp.dot(x_ref[:], w_ref[:, g * LANE:(g + 1) * LANE],
                          preferred_element_type=jnp.float32)
                  + b_ref[:, g * LANE:(g + 1) * LANE])
            out_ref[:, g, :] = tg
            mg = jnp.max(tg, axis=1, keepdims=True)
            acc = jnp.where(lane_r == j * gpv + g, mg, acc)
            m_prev, s_prev = m_new, s_new
            m_new = jnp.maximum(m_prev, mg)
            s_new = (s_prev * jnp.exp(m_prev - m_new)
                     + jnp.sum(jnp.exp(tg - m_new), axis=1,
                               keepdims=True))
        rowmax_ref[:] = acc
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        s_s[:] = jnp.broadcast_to(s_new, s_s.shape)

        @pl.when(j == n_vtiles - 1)
        def _finish_3d():
            lse_ref[:] = jnp.broadcast_to(m_new + jnp.log(s_new),
                                          lse_ref.shape)
        return

    t = (jnp.dot(x_ref[:], w_ref[:],
                 preferred_element_type=jnp.float32) + b_ref[:])
    out_ref[:] = t                                   # (nt, vt)
    nt = t.shape[0]

    # per-128-lane-group maxima of this vocab tile, merged into the
    # accumulated (nt, r_pad) rowmax block via a lane-iota mask (the
    # same lane-expand trick _kernel uses — no 1-D intermediates)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (nt, r_pad), 1)
    acc = rowmax_ref[:]
    for g in range(gpv):  # static unroll; gpv groups per tile
        mg = jnp.max(t[:, g * LANE:(g + 1) * LANE], axis=1,
                     keepdims=True)
        acc = jnp.where(lane_r == j * gpv + g, mg, acc)
    rowmax_ref[:] = acc

    # online logsumexp across vocab tiles (flash-style folding)
    m_prev = m_s[:, :1]                              # (nt, 1)
    s_prev = s_s[:, :1]
    tile_m = jnp.max(t, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, tile_m)
    s_new = (s_prev * jnp.exp(m_prev - m_new)
             + jnp.sum(jnp.exp(t - m_new), axis=1, keepdims=True))
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
    s_s[:] = jnp.broadcast_to(s_new, s_s.shape)

    @pl.when(j == n_vtiles - 1)
    def _finish():
        lse_ref[:] = jnp.broadcast_to(m_new + jnp.log(s_new),
                                      lse_ref.shape)


def _fused_tiling(n: int, d: int, vp: int, logits_3d: bool = False):
    """Pick (nt, vt) so one row tile and a double-buffered vocab tile
    fit VMEM; returns None when no divisor works. vt maximizes MXU
    tile width; nt maximizes W reuse (W streams N/nt times)."""
    groups = vp // LANE
    gpv = 1
    for cand in range(min(groups, 8), 0, -1):
        if groups % cand == 0:
            gpv = cand
            break
    vt = gpv * LANE
    # v5e VMEM is 16 MB; the estimate below double-buffers w and the
    # logits block, which overshoots what Mosaic actually allocates —
    # a measured 15.07 MB-estimate config (N=1280, D=512, Vp=30080,
    # nt=N, vt=640) compiles and runs, and beats splitting the rows
    # (two passes over W) by 13%
    budget = 15_400_000
    for nt in range(min(n, 2048), 7, -8):
        if n % nt:
            continue
        r_pad = -(-groups // LANE) * LANE
        est = 4 * (nt * d            # x block
                   + 2 * d * vt      # w block, double-buffered
                   + 2 * nt * vt     # logits out block
                   + nt * r_pad      # rowmax out block
                   + 3 * nt * LANE)  # lse + m/s scratch
        if logits_3d:
            # the window-tiled kernel's scoped VMEM measures FAR above
            # this estimate (20.66 MB actual vs 12.4 estimated at
            # nt=640, vt=1024 — Mosaic keeps the unrolled per-group
            # tiles live); pad by 2·nt·vt so the bench shapes land on
            # nt=320 (measured ~12.4 MB actual, compiles)
            est += 4 * 2 * nt * vt
        if est <= budget:
            return nt, vt, gpv, r_pad
    return None


def _fused_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  tiling, logits_3d: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    vp = w.shape[1]
    r = vp // LANE
    nt, vt, gpv, r_pad = tiling
    n_vtiles = vp // vt
    if logits_3d:
        # logits leave the kernel window-tiled (N, R, 128): the beam
        # selector's stage-2 view (B, K·R, 128) is then a FREE bitcast
        # (R % 8 == 0 aligns the sublane tiles), where reshaping the
        # row-tiled (N, Vp) form costs a full ~2·N·Vp·4-byte HBM
        # relayout (~1 ms/step at beam 20 bench shapes, measured)
        logits_spec = pl.BlockSpec((nt, gpv, LANE),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)
        logits_shape = jax.ShapeDtypeStruct((n, r, LANE), jnp.float32)
    else:
        logits_spec = pl.BlockSpec((nt, vt), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)
        logits_shape = jax.ShapeDtypeStruct((n, vp), jnp.float32)
    logits, rowmax, lse = pl.pallas_call(
        partial(_fused_kernel, gpv=gpv, n_vtiles=n_vtiles,
                r_pad=r_pad, out_3d=logits_3d),
        grid=(n // nt, n_vtiles),
        in_specs=[
            pl.BlockSpec((nt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            logits_spec,
            pl.BlockSpec((nt, r_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            logits_shape,
            jax.ShapeDtypeStruct((n, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        ),
        scratch_shapes=(
            pltpu.VMEM((nt, LANE), jnp.float32),
            pltpu.VMEM((nt, LANE), jnp.float32),
        ),
        interpret=pallas_interpret(),
    )(x, w, b)
    return logits, rowmax[:, :r], lse[:, 0]


@lru_cache(maxsize=64)
def _fused_compiles(n: int, d: int, vp: int, tiling, logits_3d: bool
                    ) -> bool:
    """AOT probe: does the fused kernel actually COMPILE at this exact
    per-device shape? `_fused_tiling`'s VMEM model is empirically
    calibrated, not conservative — a shape it accepts can still exceed
    Mosaic's scoped-VMEM budget, which on the relay backend surfaces
    as an instant HTTP 500 at decode time with no way to recover
    inside the trace. Compiling the kernel standalone (abstract
    operands, no data) catches that per shape, once, for ~1 s; on
    failure the dispatch below takes the pure-JAX reference instead.
    Interpret mode (CPU tests) never hits Mosaic and always passes."""
    if pallas_interpret():
        return True
    try:
        fn = jax.jit(partial(_fused_pallas, tiling=tiling,
                             logits_3d=logits_3d))
        fn.lower(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((d, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ).compile()
        return True
    except Exception as exc:  # noqa: BLE001 — any Mosaic/XLA failure
        from ..logging import warn
        warn(f"fused logit kernel does not compile at shape "
             f"N={n} D={d} Vp={vp} (tiling {tiling}, "
             f"3d={logits_3d}): {type(exc).__name__}: "
             f"{str(exc)[:160]}; using the pure-JAX path")
        return False


def fused_logits_rowmax_lse(
        x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
        force_pallas: bool = None, logits_3d: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Logit projection with the hierarchical beam selector's two
    reductions fused into its epilogue: logits = x·w + b are computed
    tile-by-tile in VMEM and the per-128-lane rowmax + per-row
    logsumexp are folded online, so the (N, Vp) logits matrix is
    written ONCE and never re-read from HBM (the separate rowmax_lse
    pass re-reads ~N·Vp·4 bytes per decode step — 77 MB at the
    bench's beam-10 shape, 154 MB at beam 20).

    x: (N, D) prelogit rows, w: (D, Vp) lane-aligned projection,
    b: (1, Vp) bias (pad columns carry a large negative bias).
    Returns (logits, rowmax (N, Vp/128), lse (N,)).
    Ineligible shapes/backends take the pure-JAX reference.

    ``logits_3d=True`` returns the logits window-tiled as
    (N, Vp/128, 128) instead of (N, Vp) — with Vp/128 a multiple of 8
    the kernel writes that layout DIRECTLY, so the beam selector's
    stage-2 candidate gather never pays the row-tiled→window-tiled
    HBM relayout (~1 ms/step at (1280, 30080); the two layouts tile
    sublanes over different axes, so XLA must otherwise copy)."""
    n, d = x.shape
    vp = w.shape[1]
    if logits_3d and vp % LANE:
        raise ValueError("logits_3d requires a lane-aligned Vp")

    def _reference():
        logits, rowmax, lse = _fused_logits_rowmax_lse_reference(
            x, w, b)
        if logits_3d:
            logits = logits.reshape(n, vp // LANE, LANE)
        return logits, rowmax, lse

    enabled = use_pallas() if force_pallas is None else force_pallas
    if (not enabled or n % SUBLANES or vp % LANE or d % LANE
            or x.dtype != jnp.float32 or w.dtype != jnp.float32):
        return _reference()
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is not None:
        # data-parallel meshes shard the row axis; w/b replicate. A
        # >1 'model' axis could shard the vocab columns instead —
        # that layout keeps the unfused path (reference).
        dp = plan.data
        if plan.model > 1:
            return _reference()
        if n % dp:
            return _reference()
        tiling = _fused_tiling(n // dp, d, vp,
                               logits_3d=logits_3d)
        if tiling is None or (n // dp) % SUBLANES:
            return _reference()
        kern_3d = logits_3d and tiling[2] % SUBLANES == 0
        if not _fused_compiles(n // dp, d, vp, tiling, kern_3d):
            return _reference()
        from jax.sharding import PartitionSpec as P
        logits_out = (P("data", None, None) if kern_3d
                      else P("data", None))
        wrapped = plan.shard_map(
            partial(_fused_pallas, tiling=tiling, logits_3d=kern_3d),
            in_specs=(P("data", None), P(None, None), P(None, None)),
            out_specs=(logits_out, P("data", None), P("data")))
        logits, rowmax, lse = wrapped(x, w, b)
        if logits_3d and not kern_3d:
            logits = logits.reshape(n, vp // LANE, LANE)
        return logits, rowmax, lse
    tiling = _fused_tiling(n, d, vp, logits_3d=logits_3d)
    if tiling is None:
        return _reference()
    kern_3d = logits_3d and tiling[2] % SUBLANES == 0
    if not _fused_compiles(n, d, vp, tiling, kern_3d):
        return _reference()
    logits, rowmax, lse = _fused_pallas(x, w, b, tiling,
                                        logits_3d=kern_3d)
    if logits_3d and not kern_3d:
        logits = logits.reshape(n, vp // LANE, LANE)
    return logits, rowmax, lse


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
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is not None:
        # per-data-shard rows must stay a multiple of the kernel's
        # 8-row sublane grid
        dp = plan.data
        if n % dp or (n // dp) % SUBLANES:
            return _rowmax_lse_reference(x)
        from jax.sharding import PartitionSpec as P
        wrapped = plan.shard_map(
            _rowmax_lse_pallas, in_specs=(P("data", None),),
            out_specs=(P("data", None), P("data")))
        return wrapped(x)
    return _rowmax_lse_pallas(x)
