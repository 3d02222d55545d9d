"""Fused GRU recurrent scan as a Pallas TPU kernel.

The TPU-native replacement for the reference's recurrent encoder inner
loop (BASELINE.json: "fused Pallas kernels for the recurrent scan").

Split of labor (the classic RNN-fusion recipe):
- the input-side matmuls ``x @ W_gx`` / ``x @ W_cx`` are hoisted out of
  the time loop into two large (B·T, D)×(D, ·) MXU matmuls that XLA
  schedules perfectly;
- the *serial* part runs in ONE Pallas kernel with a sequential grid
  over TIME: the hidden state lives in a VMEM scratch buffer, both
  recurrent weight matrices stay pinned in VMEM across all steps, and
  each grid step streams one (B, 1, ·) time slice in/out of HBM. The
  whole batch participates in every step's matmul, so the MXU sees
  (B, H)×(H, 2H) operands — full-width, unlike a batch-tiled design
  whose 8-row matmuls waste 94% of the systolic array.

Training differentiates through a hand-written BPTT kernel (cuDNN
recipe): the serial reverse-time pass runs in the same streaming style
emitting per-step pre-activation gradients, and every weight/input
gradient then reduces to one large MXU matmul over the flattened
(B*T) axis that XLA schedules. Golden-tested (values AND gradients)
against the pure-JAX scan in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_config import pallas_interpret

# Upper bound on batch rows per block (the auto-fit below shrinks it).
DEFAULT_BATCH_TILE = 512

# Conservative VMEM budget for one kernel invocation (16 MB physical;
# leave headroom for Mosaic's own temporaries).
VMEM_BUDGET_BYTES = 12 * 2 ** 20

_LANE = 128


def _fwd_block_bytes(tile: int, hidden: int, save_carries: bool) -> int:
    """Resident VMEM for one forward grid step: pinned weights + the
    double-buffered streamed time slices + the carry scratch."""
    weights = 3 * hidden * hidden * 4           # wgh (H,2H) + wch (H,H)
    streamed = 2 * hidden + hidden + _LANE + hidden + hidden  # xg xc m out fin
    if save_carries:
        streamed += hidden
    return weights + tile * 4 * (2 * streamed + hidden)


def _bwd_block_bytes(tile: int, hidden: int) -> int:
    weights = 6 * hidden * hidden * 4           # wgh, wch + transposes
    streamed = (2 * hidden + hidden + _LANE + hidden + hidden  # xg xc m hp go
                + 2 * hidden + hidden + hidden)               # dxg dxc gfin
    return weights + tile * 4 * (2 * streamed + hidden)


def _fit_batch_tile(batch: int, requested: int, block_bytes) -> int:
    """Batch rows per block: as many as fit the VMEM budget (multiple
    of 8 for sublane alignment); 0 if even 8 rows do not fit."""
    tile = min(requested, -(-batch // 8) * 8)
    tile = max(8, tile // 8 * 8)
    while tile >= 8:
        if block_bytes(tile) <= VMEM_BUDGET_BYTES:
            return tile
        tile = (tile // 2) // 8 * 8
    return 0


def fits_vmem(time: int, hidden: int) -> bool:
    """Dispatch gate: True when forward AND backward kernels fit VMEM
    at the minimum 8-row tile. Time no longer matters — the sequential
    grid streams one time slice per step — but the signature keeps it
    for call-site stability."""
    del time
    return (_fwd_block_bytes(8, hidden, True) <= VMEM_BUDGET_BYTES
            and _bwd_block_bytes(8, hidden) <= VMEM_BUDGET_BYTES)


def _gru_scan_kernel(xg_ref, xc_ref, mask_ref, wgh_ref, wch_ref,
                     *rest, time: int, hidden: int, save_carries: bool):
    # all (T, B, ·) operands arrive as (1, tile, ·) time-slice blocks:
    # time-major layout keeps the block's last two dims (tile, ·)
    # Mosaic-aligned for any time length
    if save_carries:
        out_ref, final_ref, carry_ref, h_ref = rest
    else:
        out_ref, final_ref = rest[0], rest[1]
        carry_ref, h_ref = None, rest[2]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():  # fresh hidden state per batch tile
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    xg_t = xg_ref[0, :, :]
    xc_t = xc_ref[0, :, :]
    # the mask arrives lane-expanded to (T, B, LANE): slicing a (T, B)
    # block on its unaligned last dim does not lower on Mosaic; a
    # static first-column slice of an aligned row does
    m_t = mask_ref[0, :, :][:, 0:1]
    gates = jax.nn.sigmoid(
        xg_t + jnp.dot(h, wgh_ref[:],
                       preferred_element_type=jnp.float32))
    r = gates[:, :hidden]
    u = gates[:, hidden:]
    cand = jnp.tanh(
        xc_t + jnp.dot(r * h, wch_ref[:],
                       preferred_element_type=jnp.float32))
    new_h = u * h + (1.0 - u) * cand
    out_ref[0, :, :] = m_t * new_h
    carry = m_t * new_h + (1.0 - m_t) * h
    if carry_ref is not None:
        # saved for the hand-written BPTT kernel's residuals
        carry_ref[0, :, :] = carry
    h_ref[:] = carry

    @pl.when(i == time - 1)
    def _finish():
        final_ref[0, :, :] = carry


def _gru_bwd_kernel(xg_ref, xc_ref, mask_ref, hprev_ref, gout_ref,
                    gfinal_ref, wgh_ref, wch_ref, wght_ref, wcht_ref,
                    dxg_ref, dxc_ref, dc_ref, *, hidden: int):
    """Reverse-time BPTT step for the fused GRU scan (the serial part).

    Recomputes this step's gates/candidate from the saved pre-step
    hidden state (cuDNN-style: activations cheaper to recompute than to
    store), then emits the per-step pre-activation gradients dxg / dxc.
    All weight/input gradients are large one-shot MXU matmuls over
    those, done OUTSIDE the kernel by XLA (see _gru_scan_bwd). The
    index maps feed time slices in reverse scan order."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dc_ref[:] = gfinal_ref[0, :, :]

    dcarry = dc_ref[:]
    m_t = mask_ref[0, :, :][:, 0:1]
    h_prev = hprev_ref[0, :, :]
    # recompute forward step t
    gates = jax.nn.sigmoid(
        xg_ref[0, :, :] + jnp.dot(
            h_prev, wgh_ref[:], preferred_element_type=jnp.float32))
    r = gates[:, :hidden]
    u = gates[:, hidden:]
    cand = jnp.tanh(
        xc_ref[0, :, :] + jnp.dot(
            r * h_prev, wch_ref[:],
            preferred_element_type=jnp.float32))
    # out_t = m*new_h; carry_t = m*new_h + (1-m)*h_prev
    dnew_h = m_t * (dcarry + gout_ref[0, :, :])
    dh_prev = (1.0 - m_t) * dcarry
    # new_h = u*h_prev + (1-u)*cand
    du = dnew_h * (h_prev - cand)
    dh_prev = dh_prev + dnew_h * u
    dcand = dnew_h * (1.0 - u)
    # cand = tanh(xc + (r*h)@Wch)
    da_c = dcand * (1.0 - cand * cand)
    dxc_ref[0, :, :] = da_c
    drh = jnp.dot(da_c, wcht_ref[:],
                  preferred_element_type=jnp.float32)
    dr = drh * h_prev
    dh_prev = dh_prev + drh * r
    # gates = sigmoid(xg + h@Wgh); d(sigmoid) = g*(1-g)
    dgates = jnp.concatenate([dr, du], axis=-1) \
        * gates * (1.0 - gates)
    dxg_ref[0, :, :] = dgates
    dh_prev = dh_prev + jnp.dot(
        dgates, wght_ref[:], preferred_element_type=jnp.float32)
    dc_ref[:] = dh_prev


def _pad_batch_axis(arrays, batch: int, tile: int, axis: int = 1):
    """Pad the batch axis (axis 1 in time-major layout) to a multiple
    of the tile."""
    padded_batch = -(-batch // tile) * tile
    if padded_batch == batch:
        return arrays, batch
    out = []
    for a in arrays:
        pads = [(0, 0)] * a.ndim
        pads[axis if a.ndim > axis else 0] = (0, padded_batch - batch)
        out.append(jnp.pad(a, pads))
    return out, padded_batch


def _lane_mask_tm(mask_tm):
    """(T, B) mask lane-expanded to (T, B, LANE)."""
    return jnp.broadcast_to(
        mask_tm.astype(jnp.float32)[:, :, None],
        mask_tm.shape + (_LANE,))


def _hoisted_inputs_tm(params, inputs):
    """The input-side MXU matmuls shared by forward and backward,
    emitted TIME-MAJOR (T, B, ·) so the scan kernel's time-slice
    blocks stay Mosaic-aligned."""
    inputs_tm = jnp.swapaxes(inputs, 0, 1)
    xg = (jnp.dot(inputs_tm, params["gates_x"],
                  preferred_element_type=jnp.float32)
          + params["gates_b"]).astype(jnp.float32)
    xc = (jnp.dot(inputs_tm, params["cand_x"],
                  preferred_element_type=jnp.float32)
          + params["cand_b"]).astype(jnp.float32)
    return xg, xc


def _gru_scan_pallas(params, inputs: jnp.ndarray, mask: jnp.ndarray,
                     reverse: bool,
                     batch_tile: int,
                     save_carries: bool = False):
    batch, time, _ = inputs.shape
    hidden = params["cand_b"].shape[0]
    tile = _fit_batch_tile(
        batch, batch_tile,
        lambda t: _fwd_block_bytes(t, hidden, save_carries))
    if tile == 0:
        raise ValueError(
            f"GRU scan block (H={hidden}) exceeds VMEM; "
            "gate dispatch with fits_vmem()")
    xg, xc = _hoisted_inputs_tm(params, inputs)
    mask_tm = jnp.swapaxes(mask, 0, 1)
    (xg, xc, mask_tm), padded_batch = _pad_batch_axis(
        (xg, xc, mask_tm), batch, tile)
    mask_lanes = _lane_mask_tm(mask_tm)

    # sequential grid: (batch tiles, time); the time step's original
    # index comes from the block index maps so the kernel itself is
    # direction-agnostic
    def t_of(i):
        return time - 1 - i if reverse else i

    slice_spec = pl.BlockSpec((1, tile, hidden),
                              lambda b, i: (t_of(i), b, 0))
    fixed_spec = pl.BlockSpec((1, tile, hidden), lambda b, i: (0, b, 0))
    kernel = functools.partial(
        _gru_scan_kernel, time=time, hidden=hidden,
        save_carries=save_carries)
    out_shape = [
        jax.ShapeDtypeStruct((time, padded_batch, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, padded_batch, hidden), jnp.float32),
    ]
    out_specs = [slice_spec, fixed_spec]
    if save_carries:
        out_shape.append(jax.ShapeDtypeStruct(
            (time, padded_batch, hidden), jnp.float32))
        out_specs.append(slice_spec)
    results = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(padded_batch // tile, time),
        in_specs=[
            pl.BlockSpec((1, tile, 2 * hidden),
                         lambda b, i: (t_of(i), b, 0)),
            slice_spec,
            pl.BlockSpec((1, tile, _LANE),
                         lambda b, i: (t_of(i), b, 0)),
            pl.BlockSpec((hidden, 2 * hidden), lambda b, i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda b, i: (0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32)],
        interpret=pallas_interpret(),
    )(xg, xc, mask_lanes,
      params["gates_h"].astype(jnp.float32),
      params["cand_h"].astype(jnp.float32))

    # outputs stay float32 even for bf16 inputs — the same f32-carry
    # semantics as the XLA scan path (ops/rnn.py state_dtype)
    outputs_tm, final = results[0], results[1][0]
    outputs = jnp.swapaxes(outputs_tm, 0, 1)[:batch]
    final = final[:batch]
    if save_carries:
        # residual kept TIME-MAJOR — the backward pass consumes it
        # directly, avoiding a transpose round-trip
        return outputs, final, results[2][:, :batch]
    return outputs, final


def _bwd_pallas(params, xg, xc, mask_tm, hprev, gout_tm, gfinal,
                reverse: bool, batch_tile: int):
    """Run the BPTT kernel on time-major operands; returns time-major
    (dxg, dxc) aligned to original time indices."""
    time, batch, hidden = hprev.shape
    tile = _fit_batch_tile(batch, batch_tile,
                           lambda t: _bwd_block_bytes(t, hidden))
    if tile == 0:
        raise ValueError(
            f"GRU BPTT block (H={hidden}) exceeds VMEM; "
            "gate dispatch with fits_vmem()")
    (xg, xc, mask_tm, hprev, gout_tm, gfinal), padded_batch = \
        _pad_batch_axis(
            (xg, xc, mask_tm, hprev,
             gout_tm.astype(jnp.float32),
             gfinal.astype(jnp.float32)[None]), batch, tile)
    mask_lanes = _lane_mask_tm(mask_tm)
    wgh = params["gates_h"].astype(jnp.float32)
    wch = params["cand_h"].astype(jnp.float32)

    # visit the forward scan's steps in reverse
    def t_of(i):
        return i if reverse else time - 1 - i

    slice_spec = pl.BlockSpec((1, tile, hidden),
                              lambda b, i: (t_of(i), b, 0))
    kernel = functools.partial(_gru_bwd_kernel, hidden=hidden)
    dxg, dxc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((time, padded_batch, 2 * hidden),
                                 jnp.float32),
            jax.ShapeDtypeStruct((time, padded_batch, hidden),
                                 jnp.float32),
        ),
        grid=(padded_batch // tile, time),
        in_specs=[
            pl.BlockSpec((1, tile, 2 * hidden),
                         lambda b, i: (t_of(i), b, 0)),
            slice_spec,
            pl.BlockSpec((1, tile, _LANE),
                         lambda b, i: (t_of(i), b, 0)),
            slice_spec,
            slice_spec,
            pl.BlockSpec((1, tile, hidden), lambda b, i: (0, b, 0)),
            pl.BlockSpec((hidden, 2 * hidden), lambda b, i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda b, i: (0, 0)),
            pl.BlockSpec((2 * hidden, hidden), lambda b, i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda b, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, 2 * hidden),
                         lambda b, i: (t_of(i), b, 0)),
            slice_spec,
        ),
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32)],
        interpret=pallas_interpret(),
    )(xg, xc, mask_lanes, hprev, gout_tm, gfinal,
      wgh, wch, wgh.T, wch.T)
    return dxg[:, :batch], dxc[:, :batch]


# Differentiable wrapper: fused Pallas forward AND a hand-written BPTT
# backward (cuDNN-style): the serial reverse-time part runs in one
# Pallas kernel emitting per-step pre-activation gradients; all weight
# and input gradients then reduce to large one-shot MXU matmuls that
# XLA schedules (dW = activations^T @ dpreact over the flattened
# (B*T) axis).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_scan(params, inputs, mask, reverse: bool = False,
             batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused GRU over (B, T, D) inputs with (B, T) mask.

    ``params`` is the GRUCell param dict (TF1 conventions, ops/nn.py).
    Returns (outputs (B, T, H), final hidden (B, H)) with identical
    semantics to ``ops.rnn.unidirectional_rnn``.
    """
    return _gru_scan_pallas(params, inputs, mask, reverse, batch_tile)


def _gru_scan_fwd(params, inputs, mask, reverse, batch_tile):
    outputs, final, carries = _gru_scan_pallas(
        params, inputs, mask, reverse, batch_tile, save_carries=True)
    return (outputs, final), (params, inputs, mask, carries)


def _shift_carries_tm(carries_tm, reverse: bool):
    """Pre-step hidden state h_prev aligned to each time index: the
    carry of the previous scan step (zero at the scan's first step).
    Time-major (T, B, H)."""
    _, batch, hidden = carries_tm.shape
    zero = jnp.zeros((1, batch, hidden), carries_tm.dtype)
    if reverse:  # scan visits t = T-1 .. 0; h_prev(t) = carry(t+1)
        return jnp.concatenate([carries_tm[1:], zero], axis=0)
    return jnp.concatenate([zero, carries_tm[:-1]], axis=0)


def _gru_scan_bwd(reverse, batch_tile, residuals, grads):
    params, inputs, mask, carries_tm = residuals
    gout, gfinal = grads
    in_dtype = inputs.dtype
    # recompute the hoisted input-side preactivations (cheap MXU work)
    xg, xc = _hoisted_inputs_tm(params, inputs)
    hprev = _shift_carries_tm(carries_tm, reverse)
    mask_tm = jnp.swapaxes(mask, 0, 1)
    gout_tm = jnp.swapaxes(gout, 0, 1)

    dxg, dxc = _bwd_pallas(params, xg, xc, mask_tm, hprev,
                           gout_tm, gfinal, reverse, batch_tile)

    # weight/input grads: one-shot MXU matmuls over the (T*B) axis
    wgh = params["gates_h"].astype(jnp.float32)
    gates = jax.nn.sigmoid(xg + jnp.dot(
        hprev, wgh, preferred_element_type=jnp.float32))
    hidden = carries_tm.shape[-1]
    rh = gates[..., :hidden] * hprev
    flat = lambda a: a.reshape(-1, a.shape[-1])  # noqa: E731
    x32_tm = jnp.swapaxes(inputs, 0, 1).astype(jnp.float32)
    dparams = {
        "gates_x": jnp.dot(flat(x32_tm).T, flat(dxg),
                           preferred_element_type=jnp.float32),
        "gates_h": jnp.dot(flat(hprev).T, flat(dxg),
                           preferred_element_type=jnp.float32),
        "gates_b": jnp.sum(dxg, axis=(0, 1)),
        "cand_x": jnp.dot(flat(x32_tm).T, flat(dxc),
                          preferred_element_type=jnp.float32),
        "cand_h": jnp.dot(flat(rh).T, flat(dxc),
                          preferred_element_type=jnp.float32),
        "cand_b": jnp.sum(dxc, axis=(0, 1)),
    }
    dparams = {k: v.astype(params[k].dtype) for k, v in dparams.items()}
    dinputs_tm = (jnp.dot(dxg, params["gates_x"].astype(jnp.float32).T,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(dxc,
                            params["cand_x"].astype(jnp.float32).T,
                            preferred_element_type=jnp.float32))
    dinputs = jnp.swapaxes(dinputs_tm, 0, 1).astype(in_dtype)
    # mask derives from token ids — never differentiated
    dmask = jnp.zeros_like(mask)
    return dparams, dinputs, dmask


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)


def bidirectional_gru_scan(fw_params, bw_params, inputs, mask,
                           batch_tile: int = DEFAULT_BATCH_TILE):
    fw_out, fw_final = gru_scan(fw_params, inputs, mask,
                                reverse=False, batch_tile=batch_tile)
    bw_out, bw_final = gru_scan(bw_params, inputs, mask,
                                reverse=True, batch_tile=batch_tile)
    return (jnp.concatenate([fw_out, bw_out], axis=-1),
            jnp.concatenate([fw_final, bw_final], axis=-1))


# ====================================================================== #
# LSTM: the same streaming grid-over-time recipe (VERDICT r1 item 6 —
# the reference treats GRU/LSTM symmetrically, nm/encoders/recurrent.py
# cell choice). One recurrent matmul per step (h @ Wh, (B,H)x(H,4H)),
# c/h carried in VMEM scratch, hand-written BPTT kernel.
# ====================================================================== #
def _lstm_fwd_block_bytes(tile: int, hidden: int,
                          save_carries: bool) -> int:
    weights = 4 * hidden * hidden * 4               # Wh (H, 4H)
    streamed = 4 * hidden + _LANE + hidden + hidden  # xz m out fin
    if save_carries:
        streamed += 2 * hidden
    return weights + tile * 4 * (2 * streamed + 2 * hidden)


def _lstm_bwd_block_bytes(tile: int, hidden: int) -> int:
    weights = 8 * hidden * hidden * 4               # Wh + Wh^T
    streamed = (4 * hidden + _LANE + 2 * hidden + hidden  # xz m cp hp
                + hidden + 4 * hidden + hidden)           # go dxz gfin
    return weights + tile * 4 * (2 * streamed + 2 * hidden)


def lstm_fits_vmem(time: int, hidden: int) -> bool:
    del time
    return (_lstm_fwd_block_bytes(8, hidden, True) <= VMEM_BUDGET_BYTES
            and _lstm_bwd_block_bytes(8, hidden) <= VMEM_BUDGET_BYTES)


def _lstm_scan_kernel(xz_ref, mask_ref, wh_ref, *rest, time: int,
                      hidden: int, forget_bias: float,
                      save_carries: bool):
    if save_carries:
        out_ref, final_ref, ccar_ref, hcar_ref, c_ref, h_ref = rest
    else:
        out_ref, final_ref, c_ref, h_ref = rest
        ccar_ref = hcar_ref = None
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        c_ref[:] = jnp.zeros_like(c_ref)
        h_ref[:] = jnp.zeros_like(h_ref)

    c = c_ref[:]
    h = h_ref[:]
    m_t = mask_ref[0, :, :][:, 0:1]
    z = xz_ref[0, :, :] + jnp.dot(h, wh_ref[:],
                                  preferred_element_type=jnp.float32)
    # TF1 BasicLSTMCell gate order: i, j, f, o
    si = jax.nn.sigmoid(z[:, :hidden])
    tj = jnp.tanh(z[:, hidden:2 * hidden])
    sf = jax.nn.sigmoid(z[:, 2 * hidden:3 * hidden] + forget_bias)
    so = jax.nn.sigmoid(z[:, 3 * hidden:])
    c_new = c * sf + si * tj
    h_new = jnp.tanh(c_new) * so
    out_ref[0, :, :] = m_t * h_new
    c_car = m_t * c_new + (1.0 - m_t) * c
    h_car = m_t * h_new + (1.0 - m_t) * h
    if ccar_ref is not None:
        ccar_ref[0, :, :] = c_car
        hcar_ref[0, :, :] = h_car
    c_ref[:] = c_car
    h_ref[:] = h_car

    @pl.when(i == time - 1)
    def _finish():
        final_ref[0, :, :] = h_car


def _lstm_bwd_kernel(xz_ref, mask_ref, cprev_ref, hprev_ref, gout_ref,
                     gfinal_ref, wh_ref, wht_ref, dxz_ref,
                     dc_ref, dh_ref, *, hidden: int,
                     forget_bias: float):
    """Reverse-time LSTM BPTT step: recompute the gates from the saved
    pre-step (c, h), emit the per-step pre-activation gradient dz; all
    weight/input gradients happen outside as one-shot MXU matmuls."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dh_ref[:] = gfinal_ref[0, :, :]

    dc_carry = dc_ref[:]
    dh_carry = dh_ref[:]
    m_t = mask_ref[0, :, :][:, 0:1]
    c_prev = cprev_ref[0, :, :]
    h_prev = hprev_ref[0, :, :]
    z = xz_ref[0, :, :] + jnp.dot(h_prev, wh_ref[:],
                                  preferred_element_type=jnp.float32)
    si = jax.nn.sigmoid(z[:, :hidden])
    tj = jnp.tanh(z[:, hidden:2 * hidden])
    sf = jax.nn.sigmoid(z[:, 2 * hidden:3 * hidden] + forget_bias)
    so = jax.nn.sigmoid(z[:, 3 * hidden:])
    c_new = c_prev * sf + si * tj
    tc = jnp.tanh(c_new)

    # out_t = m*h_new; {c,h}_carry = m*new + (1-m)*prev
    dh_new = m_t * (dh_carry + gout_ref[0, :, :])
    dh_prev = (1.0 - m_t) * dh_carry
    dc_new = m_t * dc_carry + dh_new * so * (1.0 - tc * tc)
    dc_prev = (1.0 - m_t) * dc_carry + dc_new * sf
    dso = dh_new * tc
    dsf = dc_new * c_prev
    dsi = dc_new * tj
    dtj = dc_new * si
    dz = jnp.concatenate(
        [dsi * si * (1.0 - si),
         dtj * (1.0 - tj * tj),
         dsf * sf * (1.0 - sf),
         dso * so * (1.0 - so)], axis=-1)
    dxz_ref[0, :, :] = dz
    dh_prev = dh_prev + jnp.dot(
        dz, wht_ref[:], preferred_element_type=jnp.float32)
    dc_ref[:] = dc_prev
    dh_ref[:] = dh_prev


def _lstm_hoisted_inputs_tm(params, inputs):
    inputs_tm = jnp.swapaxes(inputs, 0, 1)
    return (jnp.dot(inputs_tm, params["kernel_x"],
                    preferred_element_type=jnp.float32)
            + params["bias"]).astype(jnp.float32)


def _lstm_scan_pallas(params, inputs, mask, reverse: bool,
                      forget_bias: float, batch_tile: int,
                      save_carries: bool = False):
    batch, time, _ = inputs.shape
    hidden = params["kernel_h"].shape[0]
    tile = _fit_batch_tile(
        batch, batch_tile,
        lambda t: _lstm_fwd_block_bytes(t, hidden, save_carries))
    if tile == 0:
        raise ValueError(
            f"LSTM scan block (H={hidden}) exceeds VMEM; "
            "gate dispatch with lstm_fits_vmem()")
    xz = _lstm_hoisted_inputs_tm(params, inputs)
    mask_tm = jnp.swapaxes(mask, 0, 1)
    (xz, mask_tm), padded_batch = _pad_batch_axis(
        (xz, mask_tm), batch, tile)
    mask_lanes = _lane_mask_tm(mask_tm)

    def t_of(i):
        return time - 1 - i if reverse else i

    slice_spec = pl.BlockSpec((1, tile, hidden),
                              lambda b, i: (t_of(i), b, 0))
    fixed_spec = pl.BlockSpec((1, tile, hidden), lambda b, i: (0, b, 0))
    kernel = functools.partial(
        _lstm_scan_kernel, time=time, hidden=hidden,
        forget_bias=forget_bias, save_carries=save_carries)
    out_shape = [
        jax.ShapeDtypeStruct((time, padded_batch, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, padded_batch, hidden), jnp.float32),
    ]
    out_specs = [slice_spec, fixed_spec]
    if save_carries:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct(
                (time, padded_batch, hidden), jnp.float32))
            out_specs.append(slice_spec)
    results = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(padded_batch // tile, time),
        in_specs=[
            pl.BlockSpec((1, tile, 4 * hidden),
                         lambda b, i: (t_of(i), b, 0)),
            pl.BlockSpec((1, tile, _LANE),
                         lambda b, i: (t_of(i), b, 0)),
            pl.BlockSpec((hidden, 4 * hidden), lambda b, i: (0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32),
                        pltpu.VMEM((tile, hidden), jnp.float32)],
        interpret=pallas_interpret(),
    )(xz, mask_lanes, params["kernel_h"].astype(jnp.float32))

    outputs = jnp.swapaxes(results[0], 0, 1)[:batch]
    final = results[1][0][:batch]
    if save_carries:
        return outputs, final, results[2][:, :batch], \
            results[3][:, :batch]
    return outputs, final


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_scan(params, inputs, mask, reverse: bool = False,
              forget_bias: float = 1.0,
              batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused LSTM over (B, T, D) inputs with (B, T) mask.

    ``params`` is the LSTMCell param dict (TF1 i,j,f,o gate order,
    ops/nn.py). Returns (outputs (B, T, H), final hidden h (B, H)) —
    identical semantics to ``ops.rnn.unidirectional_rnn``."""
    return _lstm_scan_pallas(params, inputs, mask, reverse,
                             forget_bias, batch_tile)


def _lstm_scan_fwd(params, inputs, mask, reverse, forget_bias,
                   batch_tile):
    outputs, final, c_car, h_car = _lstm_scan_pallas(
        params, inputs, mask, reverse, forget_bias, batch_tile,
        save_carries=True)
    return (outputs, final), (params, inputs, mask, c_car, h_car)


def _lstm_scan_bwd(reverse, forget_bias, batch_tile, residuals, grads):
    params, inputs, mask, c_car_tm, h_car_tm = residuals
    gout, gfinal = grads
    in_dtype = inputs.dtype
    xz = _lstm_hoisted_inputs_tm(params, inputs)
    cprev = _shift_carries_tm(c_car_tm, reverse)
    hprev = _shift_carries_tm(h_car_tm, reverse)
    mask_tm = jnp.swapaxes(mask, 0, 1)
    gout_tm = jnp.swapaxes(gout, 0, 1)

    time, batch, hidden = hprev.shape
    tile = _fit_batch_tile(
        batch, batch_tile,
        lambda t: _lstm_bwd_block_bytes(t, hidden))
    if tile == 0:
        raise ValueError(
            f"LSTM BPTT block (H={hidden}) exceeds VMEM; "
            "gate dispatch with lstm_fits_vmem()")
    (xz_p, mask_p, cprev_p, hprev_p, gout_p, gfinal_p), padded_batch = \
        _pad_batch_axis(
            (xz, mask_tm, cprev, hprev,
             gout_tm.astype(jnp.float32),
             gfinal.astype(jnp.float32)[None]), batch, tile)
    mask_lanes = _lane_mask_tm(mask_p)
    wh = params["kernel_h"].astype(jnp.float32)

    def t_of(i):
        return i if reverse else time - 1 - i

    slice_spec = pl.BlockSpec((1, tile, hidden),
                              lambda b, i: (t_of(i), b, 0))
    wide_spec = pl.BlockSpec((1, tile, 4 * hidden),
                             lambda b, i: (t_of(i), b, 0))
    dxz = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, hidden=hidden,
                          forget_bias=forget_bias),
        out_shape=jax.ShapeDtypeStruct(
            (time, padded_batch, 4 * hidden), jnp.float32),
        grid=(padded_batch // tile, time),
        in_specs=[
            wide_spec,
            pl.BlockSpec((1, tile, _LANE),
                         lambda b, i: (t_of(i), b, 0)),
            slice_spec,
            slice_spec,
            slice_spec,
            pl.BlockSpec((1, tile, hidden), lambda b, i: (0, b, 0)),
            pl.BlockSpec((hidden, 4 * hidden), lambda b, i: (0, 0)),
            pl.BlockSpec((4 * hidden, hidden), lambda b, i: (0, 0)),
        ],
        out_specs=wide_spec,
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32),
                        pltpu.VMEM((tile, hidden), jnp.float32)],
        interpret=pallas_interpret(),
    )(xz_p, mask_lanes, cprev_p, hprev_p, gout_p, gfinal_p,
      wh, wh.T)
    dxz = dxz[:, :batch]

    flat = lambda a: a.reshape(-1, a.shape[-1])  # noqa: E731
    x32_tm = jnp.swapaxes(inputs, 0, 1).astype(jnp.float32)
    dparams = {
        "kernel_x": jnp.dot(flat(x32_tm).T, flat(dxz),
                            preferred_element_type=jnp.float32),
        "kernel_h": jnp.dot(flat(hprev).T, flat(dxz),
                            preferred_element_type=jnp.float32),
        "bias": jnp.sum(dxz, axis=(0, 1)),
    }
    dparams = {k: v.astype(params[k].dtype) for k, v in dparams.items()}
    dinputs = jnp.swapaxes(
        jnp.dot(dxz, params["kernel_x"].astype(jnp.float32).T,
                preferred_element_type=jnp.float32),
        0, 1).astype(in_dtype)
    return dparams, dinputs, jnp.zeros_like(mask)


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)
