"""Fused softmax-cross-entropy over the vocabulary projection.

The transformer train step's biggest non-matmul cost is the loss
tail: logits = states @ W (+b) over the ~30k vocab, log-softmax,
label pick, label-smoothing mean — and in the backward pass the
(N, V) softmax/dlogits matrices. Unfused, XLA materializes the
(N, V) logits and dlogits in HBM several times over (~0.4 GB each
way at bench shapes, BASELINE.md "Train-step anatomy").

This module applies the round-3 fused-epilogue recipe
(ops/beam_select.fused_logits_rowmax_lse) to the TRAINING direction,
reference semantics nm/decoders/decoder.py train xent:

- forward kernel: logits are computed tile-by-tile in VMEM; the
  per-row logsumexp (online max/sum), the label logit (one-hot lane
  pick) and the real-vocab logit sum (label smoothing's uniform
  term) fold into the epilogue. The (N, V) logits NEVER reach HBM.
- backward (custom VJP): two kernels recompute the logit tiles and
  fold dlogits = g * (softmax - (1-eps)*onehot - eps/V) directly
  into its two consumers — dx = dlogits @ W^T (rows-outer grid) and
  dW = x^T @ dlogits, db = rowsum (vocab-outer grid; Pallas output
  revisiting requires the accumulated block's grid axis to be
  outermost, hence two kernels). The (N, V) dlogits never reach HBM
  either: the trade is 2 recompute GEMMs for ~5 (N, V) HBM
  round-trips.

Both weight layouts are native (no transpose materialization):
``transposed=True`` takes the tied-embedding table (V, D) and
contracts last-dim x last-dim; ``transposed=False`` takes a plain
(D, V) projection. Non-lane-aligned V is padded once per call with
-1e9 bias columns (softmax-inert, dW slice-back).

Numerics: f32 in, f32 accumulation, exp(t - lse) <= 1 in the
backward. Exactness vs the pure-JAX twin is golden-tested in
interpret mode (tests/test_fused_xent.py).

**Default: OFF (opt-in via NM_FUSED_XENT=1) — a measured negative.**
Round-10 A/B on the idle chip (scripts/run_measurements.sh; full
numbers in BASELINE.md and docs/performance.md): the isolated tail is
5% SLOWER fused (4.70 vs 4.48 ms fwd+bwd at N=3072, V=30k, f32) and
end-to-end training is faster with the kernel OFF — RNN +5.5% f32 /
+12.9% bf16 (286.1k vs 253.5k tok/s), transformer +2.3% f32 / tie
bf16. The predicted ~5-6 ms of avoided HBM traffic does not
materialize as time: XLA overlaps the (N, V) round-trips behind the
MXU work of the surrounding GEMMs, while the fused kernels pay their
2 recompute GEMMs and lose XLA's inter-op pipelining. The kernel is
kept opt-in for its MEMORY value — the (N, V) logits/dlogits
(~0.4 GB each at bench shapes) are never materialized, which admits
larger batches in HBM-constrained configs.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from .kernel_config import pallas_interpret, use_pallas

LANE = 128
SUBLANES = 8
NEG = -1e9


# ------------------------------------------------------------------ #
# pure-JAX twin (fallback + golden reference)
# ------------------------------------------------------------------ #
def xent_reference(x, w, b, targets, eps: float,
                   transposed: bool) -> jnp.ndarray:
    """Per-token nll (N,): label-smoothed cross-entropy of
    logits = x @ w (+ b) — the pure-JAX twin of the fused path."""
    if transposed:
        logits = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(x, w, preferred_element_type=jnp.float32)
    logits = logits + b
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    target_ll = jnp.take_along_axis(
        log_probs, targets[:, None], axis=-1)[:, 0]
    if eps:
        uniform_ll = jnp.mean(log_probs, axis=-1)
        return -((1.0 - eps) * target_ll + eps * uniform_ll)
    return -target_ll


# ------------------------------------------------------------------ #
# tiling
# ------------------------------------------------------------------ #
def _tiling(n: int, d: int, vp: int) -> Optional[Tuple[int, int]]:
    """(nt, vt) row/vocab tile sizes, or None when the shape cannot
    tile. VMEM model (f32 words x 4): x (nt,d) + w (vt,d or d,vt) +
    t/p/dl (nt,vt) + dx (nt,d) + scratches — keep under ~10 MB."""
    nt = None
    for cand in (256, 128, 64, 32, 16, 8):
        if n % cand == 0:
            nt = cand
            break
    if nt is None:
        return None
    vt = None
    for cand in (1024, 640, 512, 256, 128):
        if vp % cand == 0:
            vt = cand
            break
    if vt is None:
        return None
    words = nt * d * 2 + vt * d + 2 * nt * vt + 6 * nt * LANE
    if words * 4 > 10 * 1024 * 1024:
        return None
    return nt, vt


def _pad_vocab(w, b, vp: int, transposed: bool):
    v = w.shape[0] if transposed else w.shape[1]
    if vp == v:
        return w, b
    if transposed:
        w = jnp.pad(w, ((0, vp - v), (0, 0)))
    else:
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
    b = jnp.concatenate([b, jnp.full((vp - v,), NEG, b.dtype)])
    return w, b


def eligible(n: int, d: int, x_dtype, w_dtype) -> bool:
    """Shape/dtype/backend gate for the fused path. ``use_pallas``
    covers single-device and wrapped-SPMD contexts; multi-device
    meshes additionally need the data-axis wrap below to apply.
    bf16 operands are first-class (the policy's use-site cast): the
    logit tiles run bf16xbf16->f32 on the MXU, all reductions and
    gradients accumulate f32.

    OPT-IN (NM_FUSED_XENT=1): the fused path measured end-to-end
    SLOWER than XLA's materialized loss tail (module docstring) — its
    remaining value is the (N, V) memory saving, so it must be asked
    for, not defaulted to."""
    if os.environ.get("NM_FUSED_XENT") not in ("1", "true", "True"):
        return False
    ok = (jnp.float32, jnp.bfloat16)
    if x_dtype not in ok or w_dtype not in ok:
        return False
    if d % LANE or n % SUBLANES:
        return False
    return use_pallas()


# ------------------------------------------------------------------ #
# forward kernel
# ------------------------------------------------------------------ #
def _uniform_operands(x, w):
    """Matching-dtype operand pair for an MXU dot: same dtype passes
    through (bf16xbf16 is the native fast path); mixed f32/bf16 — the
    policy's f32-layer-norm states against bf16 use-site weights —
    upcasts to f32 (mixed dots are a Mosaic lowering hazard; XLA's
    own mixed dot does the same promotion, keeping exactness vs the
    reference twin)."""
    if x.dtype == w.dtype:
        return x, w
    return x.astype(jnp.float32), w.astype(jnp.float32)


def _fwd_kernel(x_ref, w_ref, b_ref, t_ref, lse_ref, lab_ref,
                lsum_ref, m_s, s_s, lab_s, sum_s, *, vt: int,
                n_vtiles: int, real_v: int, transposed: bool):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full(m_s.shape, NEG, jnp.float32)
        s_s[:] = jnp.zeros(s_s.shape, jnp.float32)
        lab_s[:] = jnp.zeros(lab_s.shape, jnp.float32)
        sum_s[:] = jnp.zeros(sum_s.shape, jnp.float32)

    x, w = _uniform_operands(x_ref[:], w_ref[:])
    if transposed:
        t = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        t = jnp.dot(x, w, preferred_element_type=jnp.float32)
    t = t + b_ref[:]
    nt = t.shape[0]

    # scratches carry their per-row value broadcast across all 128
    # lanes (lane-0 reads, full-width stores — the beam_select
    # pattern; Mosaic dislikes 1-lane stores)
    col = jax.lax.broadcasted_iota(jnp.int32, (nt, vt), 1) + j * vt
    local = t_ref[:, :1]                   # targets, lane-0 read
    lab_new = (lab_s[:, :1]
               + jnp.sum(jnp.where(col == local, t, 0.0),
                         axis=1, keepdims=True))
    sum_new = (sum_s[:, :1]
               + jnp.sum(jnp.where(col < real_v, t, 0.0),
                         axis=1, keepdims=True))
    m_prev = m_s[:, :1]
    s_prev = s_s[:, :1]
    mg = jnp.max(t, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, mg)
    s_new = (s_prev * jnp.exp(m_prev - m_new)
             + jnp.sum(jnp.exp(t - m_new), axis=1, keepdims=True))
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
    s_s[:] = jnp.broadcast_to(s_new, s_s.shape)
    lab_s[:] = jnp.broadcast_to(lab_new, lab_s.shape)
    sum_s[:] = jnp.broadcast_to(sum_new, sum_s.shape)

    @pl.when(j == n_vtiles - 1)
    def _finish():
        lse_ref[:] = jnp.broadcast_to(m_new + jnp.log(s_new),
                                      lse_ref.shape)
        lab_ref[:] = jnp.broadcast_to(lab_new, lab_ref.shape)
        lsum_ref[:] = jnp.broadcast_to(sum_new, lsum_ref.shape)


def _fwd_pallas(x, w, b2, tcol, tiling, real_v: int,
                transposed: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    vp = w.shape[0] if transposed else w.shape[1]
    nt, vt = tiling
    n_vtiles = vp // vt
    w_spec = (pl.BlockSpec((vt, d), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM) if transposed
              else pl.BlockSpec((d, vt), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM))
    # per-row vectors ride (N, LANE) lane-broadcast layouts: Mosaic
    # handles full-width tiles; 1-lane blocks are lowering hazards
    out1 = pl.BlockSpec((nt, LANE), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, vt=vt, n_vtiles=n_vtiles,
                          real_v=real_v, transposed=transposed),
        grid=(n // nt, n_vtiles),
        in_specs=[
            pl.BlockSpec((nt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, vt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out1, out1, out1),
        out_shape=(
            jax.ShapeDtypeStruct((n, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        ),
        scratch_shapes=(
            pltpu.VMEM((nt, LANE), jnp.float32),
            pltpu.VMEM((nt, LANE), jnp.float32),
            pltpu.VMEM((nt, LANE), jnp.float32),
            pltpu.VMEM((nt, LANE), jnp.float32),
        ),
        interpret=pallas_interpret(),
    )(x, w, b2, tcol)


# ------------------------------------------------------------------ #
# backward kernels
# ------------------------------------------------------------------ #
def _dlogits(x, w_blk, b_blk, tcol, lse, g, j, vt, real_v, eps,
             transposed):
    """Recompute one logit tile and fold the xent gradient:
    dl = g * (softmax - (1-eps)*onehot - eps/V)."""
    x, w_blk = _uniform_operands(x, w_blk)
    if transposed:
        t = jax.lax.dot_general(
            x, w_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        t = jnp.dot(x, w_blk, preferred_element_type=jnp.float32)
    t = t + b_blk
    nt = t.shape[0]
    p = jnp.exp(t - lse)                   # lse (nt, 1) lane-0 read
    col = jax.lax.broadcasted_iota(jnp.int32, (nt, vt), 1) + j * vt
    dl = p - (1.0 - eps) * (col == tcol).astype(jnp.float32)
    if eps:
        dl = dl - (eps / real_v) * (col < real_v).astype(jnp.float32)
    return g * dl                          # g (nt, 1) lane-0 read


def _bwd_dx_kernel(x_ref, w_ref, b_ref, t_ref, lse_ref, g_ref,
                   dx_ref, *, vt: int, real_v: int, eps: float,
                   transposed: bool):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    dl = _dlogits(x_ref[:], w_ref[:], b_ref[:], t_ref[:, :1],
                  lse_ref[:, :1], g_ref[:, :1], j, vt, real_v, eps,
                  transposed)
    # dl is f32; cast a bf16 w tile up so the dot has uniform operands
    # (mixed f32xbf16 dots are a Mosaic lowering hazard)
    w_f32 = w_ref[:].astype(jnp.float32)
    if transposed:                         # w (vt, d)
        dx_ref[:] += jnp.dot(dl, w_f32,
                             preferred_element_type=jnp.float32)
    else:                                  # w (d, vt)
        dx_ref[:] += jax.lax.dot_general(
            dl, w_f32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_dw_kernel(x_ref, w_ref, b_ref, t_ref, lse_ref, g_ref,
                   dw_ref, db_ref, *, vt: int, real_v: int,
                   eps: float, transposed: bool):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)                   # rows INNER: dw revisits

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    j = pl.program_id(0)
    x = x_ref[:]
    dl = _dlogits(x, w_ref[:], b_ref[:], t_ref[:, :1],
                  lse_ref[:, :1], g_ref[:, :1], j, vt, real_v, eps,
                  transposed)
    x_f32 = x.astype(jnp.float32)          # uniform-dtype dw dot
    if transposed:                         # dw (vt, d)
        dw_ref[:] += jax.lax.dot_general(
            dl, x_f32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:                                  # dw (d, vt)
        dw_ref[:] += jax.lax.dot_general(
            x_f32, dl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dl, axis=0, keepdims=True)


def _bwd_pallas(x, w, b2, tcol, lse, g, tiling, real_v: int,
                eps: float, transposed: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    vp = w.shape[0] if transposed else w.shape[1]
    nt, vt = tiling
    n_vtiles = vp // vt
    col1 = pl.BlockSpec((nt, LANE), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((nt, d), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = (pl.BlockSpec((vt, d), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM) if transposed
              else pl.BlockSpec((d, vt), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM))
    b_spec = pl.BlockSpec((1, vt), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    kw = dict(vt=vt, real_v=real_v, eps=eps, transposed=transposed)

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, **kw),
        grid=(n // nt, n_vtiles),
        in_specs=[x_spec, w_spec, b_spec, col1, col1, col1],
        out_specs=pl.BlockSpec((nt, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=pallas_interpret(),
    )(x, w, b2, tcol, lse, g)

    # vocab-outer grid so the accumulated dw/db blocks revisit
    # consecutively; the index_map argument order is (j, i)
    xj = pl.BlockSpec((nt, d), lambda j, i: (i, 0),
                      memory_space=pltpu.VMEM)
    wj = (pl.BlockSpec((vt, d), lambda j, i: (j, 0),
                       memory_space=pltpu.VMEM) if transposed
          else pl.BlockSpec((d, vt), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM))
    bj = pl.BlockSpec((1, vt), lambda j, i: (0, j),
                      memory_space=pltpu.VMEM)
    colj = pl.BlockSpec((nt, LANE), lambda j, i: (i, 0),
                        memory_space=pltpu.VMEM)
    dw_shape = (vp, d) if transposed else (d, vp)
    dw_spec = (pl.BlockSpec((vt, d), lambda j, i: (j, 0),
                            memory_space=pltpu.VMEM) if transposed
               else pl.BlockSpec((d, vt), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM))
    dw, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, **kw),
        grid=(n_vtiles, n // nt),
        in_specs=[xj, wj, bj, colj, colj, colj],
        out_specs=(dw_spec,
                   pl.BlockSpec((1, vt), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(dw_shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, vp), jnp.float32)),
        interpret=pallas_interpret(),
    )(x, w, b2, tcol, lse, g)
    return dx, dw, db[0]


# ------------------------------------------------------------------ #
# custom-VJP wrapper
# ------------------------------------------------------------------ #
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused(x, w, b, targets, eps: float, real_v: int, tiling,
           transposed: bool):
    nll, _ = _fused_fwd(x, w, b, targets, eps, real_v, tiling,
                        transposed)
    return nll


def _nll_from_parts(lse, lab, lsum, eps: float, real_v: int):
    if eps:
        return -((1.0 - eps) * (lab - lse)
                 + eps * (lsum / real_v - lse))
    return -(lab - lse)


def _fused_fwd(x, w, b, targets, eps, real_v, tiling, transposed):
    vp = w.shape[0] if transposed else w.shape[1]
    wp, bp = _pad_vocab(w, b, vp_pad(vp, tiling[1]), transposed)
    tcol = jnp.broadcast_to(targets[:, None].astype(jnp.int32),
                            (targets.shape[0], LANE))
    lse, lab, lsum = _fwd_pallas(x, wp, bp[None, :], tcol, tiling,
                                 real_v, transposed)
    nll = _nll_from_parts(lse[:, 0], lab[:, 0], lsum[:, 0], eps,
                          real_v)
    return nll, (x, w, b, tcol, lse[:, 0])


def _fused_bwd(eps, real_v, tiling, transposed, residuals, g):
    x, w, b, tcol, lse = residuals
    vp = w.shape[0] if transposed else w.shape[1]
    n = x.shape[0]
    wp, bp = _pad_vocab(w, b, vp_pad(vp, tiling[1]), transposed)
    lse_b = jnp.broadcast_to(lse[:, None], (n, LANE))
    g_b = jnp.broadcast_to(g[:, None].astype(jnp.float32), (n, LANE))
    dx, dwp, dbp = _bwd_pallas(x, wp, bp[None, :], tcol, lse_b, g_b,
                               tiling, real_v, eps, transposed)
    dw = dwp[:vp] if transposed else dwp[:, :vp]
    db = dbp[:vp]
    dtargets = _np.zeros((n,), jax.dtypes.float0)
    # cotangents must match the primal dtypes (bf16 use-site params);
    # everything above accumulated f32, this is the only down-cast
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            db.astype(b.dtype), dtargets)


_fused.defvjp(_fused_fwd, _fused_bwd)


def vp_pad(v: int, vt: int) -> int:
    return -(-v // vt) * vt


@functools.lru_cache(maxsize=32)
def _compiles(n: int, d: int, v: int, eps: float, tiling,
              transposed: bool, x_dtype=jnp.float32,
              w_dtype=jnp.float32, b_dtype=jnp.float32) -> bool:
    """AOT probe: do all three kernels compile at this shape/dtype?
    (Mosaic failures through the relay are instant HTTP 500s at train
    time with no recovery — probe once per signature, fall back on
    failure.)"""
    if pallas_interpret():
        return True
    try:
        vp = vp_pad(v, tiling[1])
        wshape = (vp, d) if transposed else (d, vp)
        f = jax.jit(functools.partial(
            _fwd_pallas, tiling=tiling, real_v=v,
            transposed=transposed))
        f.lower(jax.ShapeDtypeStruct((n, d), x_dtype),
                jax.ShapeDtypeStruct(wshape, w_dtype),
                jax.ShapeDtypeStruct((1, vp), b_dtype),
                jax.ShapeDtypeStruct((n, LANE), jnp.int32)).compile()
        bwd = jax.jit(functools.partial(
            _bwd_pallas, tiling=tiling, real_v=v, eps=eps,
            transposed=transposed))
        bwd.lower(jax.ShapeDtypeStruct((n, d), x_dtype),
                  jax.ShapeDtypeStruct(wshape, w_dtype),
                  jax.ShapeDtypeStruct((1, vp), b_dtype),
                  jax.ShapeDtypeStruct((n, LANE), jnp.int32),
                  jax.ShapeDtypeStruct((n, LANE), jnp.float32),
                  jax.ShapeDtypeStruct((n, LANE), jnp.float32)).compile()
        return True
    except Exception as exc:  # noqa: BLE001 — any Mosaic/XLA failure
        from ..logging import warn
        warn(f"fused xent kernels do not compile at N={n} D={d} "
             f"V={v} (tiling {tiling}, {jnp.dtype(x_dtype).name}/"
             f"{jnp.dtype(w_dtype).name}): {type(exc).__name__}: "
             f"{str(exc)[:160]}; using the pure-JAX path")
        return False


def fused_softmax_xent(x, w, b, targets, eps: float = 0.0,
                       transposed: bool = False) -> jnp.ndarray:
    """Per-token label-smoothed cross-entropy (N,) of
    ``logits = x @ w (+ b)`` with the logits never materialized in
    HBM — falls back to the pure-JAX twin when the fused path is
    ineligible (dtype/shape/backend, model-sharded vocab, Mosaic
    compile failure).

    x: (N, D) f32, w: (V, D) when ``transposed`` (tied embedding
    table) else (D, V), b: (V,) f32, targets: (N,) int.
    """
    n, d = x.shape
    v = w.shape[0] if transposed else w.shape[1]
    eps = float(eps or 0.0)
    if not eligible(n, d, x.dtype, w.dtype):
        return xent_reference(x, w, b, targets, eps, transposed)
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is not None:
        # data meshes shard the token rows; w/b replicate and their
        # grads psum over 'data' inside the wrap (that psum IS the
        # gradient all-reduce GSPMD would otherwise insert). A >1
        # 'model' axis shards the vocab — keep the unfused path.
        if plan.model > 1 or n % (plan.data * SUBLANES):
            return xent_reference(x, w, b, targets, eps, transposed)
        # the row tile must fit the PER-SHARD row count
        tiling = _tiling(n // plan.data, d, vp_pad(v, LANE))
        if tiling is None:
            return xent_reference(x, w, b, targets, eps, transposed)
        if not _compiles(n // plan.data, d, v, eps, tiling,
                         transposed, x.dtype, w.dtype, b.dtype):
            return xent_reference(x, w, b, targets, eps, transposed)
        from jax.sharding import PartitionSpec as P

        def body(x, w, b, targets):
            return _fused(x, w, b, targets, eps, v, tiling,
                          transposed)

        wrapped = plan.shard_map(
            body,
            in_specs=(P("data", None), P(None, None), P(None),
                      P("data")),
            out_specs=P("data"))
        return wrapped(x, w, b, targets)
    # single-device (or fully-manual context): pad V to the lane grid,
    # pick the largest vocab tile dividing it (the actual pad target
    # is vt-aligned: vp_pad(v, vt))
    tiling = _tiling(n, d, vp_pad(v, LANE))
    if tiling is None or not _compiles(n, d, v, eps, tiling,
                                       transposed, x.dtype, w.dtype,
                                       b.dtype):
        return xent_reference(x, w, b, targets, eps, transposed)
    return _fused(x, w, b, targets, eps, v, tiling, transposed)
