"""Fused GRU recurrent scan as a Pallas TPU kernel.

The TPU-native replacement for the reference's recurrent encoder inner
loop (BASELINE.json: "fused Pallas kernels for the recurrent scan").

Split of labor (the classic RNN-fusion recipe):
- the input-side matmuls ``x @ W_gx`` / ``x @ W_cx`` are hoisted out of
  the time loop into two large (B·T, D)×(D, ·) MXU matmuls that XLA
  schedules perfectly;
- the *serial* part — T small (B_tile, H)×(H, ·) recurrence steps —
  runs inside ONE Pallas kernel with the hidden state and both
  recurrent weight matrices pinned in VMEM, eliminating the per-step
  HBM round-trips a ``lax.scan`` pays for its carry and weights.

Used on inference paths (the pure-JAX scan in ops/rnn.py keeps
training's autodiff); golden-tested against it in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .kernel_config import pallas_interpret

DEFAULT_BATCH_TILE = 8


def _gru_scan_kernel(xg_ref, xc_ref, mask_ref, wgh_ref, wch_ref,
                     out_ref, final_ref, *, time: int, hidden: int,
                     reverse: bool):
    batch_tile = xg_ref.shape[0]
    h0 = jnp.zeros((batch_tile, hidden), jnp.float32)

    def step(i, h):
        t = time - 1 - i if reverse else i
        xg_t = xg_ref[:, t, :]
        xc_t = xc_ref[:, t, :]
        # the mask arrives lane-expanded to (B, T, LANE) — dynamic
        # slicing a (B, T) block on its unaligned last dim does not
        # lower on Mosaic; a static first-column slice of an aligned
        # row does
        m_t = mask_ref[:, t, :][:, 0:1]
        gates = jax.nn.sigmoid(
            xg_t + jnp.dot(h, wgh_ref[:],
                           preferred_element_type=jnp.float32))
        r = gates[:, :hidden]
        u = gates[:, hidden:]
        cand = jnp.tanh(
            xc_t + jnp.dot(r * h, wch_ref[:],
                           preferred_element_type=jnp.float32))
        new_h = u * h + (1.0 - u) * cand
        out_ref[:, t, :] = m_t * new_h
        return m_t * new_h + (1.0 - m_t) * h

    final = jax.lax.fori_loop(0, time, step, h0)
    final_ref[:] = final


def _reference_gru_scan(params, inputs, mask, reverse: bool):
    """Pure-JAX semantics twin (ops.rnn) — the custom-VJP backward."""
    from .nn import GRUCell
    from .rnn import unidirectional_rnn
    hidden = params["cand_b"].shape[0]
    cell = GRUCell(inputs.shape[-1], hidden)
    return unidirectional_rnn(cell, params, inputs, mask,
                              reverse=reverse, allow_pallas=False)


def _gru_scan_pallas(params, inputs: jnp.ndarray, mask: jnp.ndarray,
                     reverse: bool,
                     batch_tile: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    batch, time, _ = inputs.shape
    hidden = params["cand_b"].shape[0]

    # hoisted MXU matmuls (XLA)
    xg = (jnp.dot(inputs, params["gates_x"],
                  preferred_element_type=jnp.float32)
          + params["gates_b"]).astype(jnp.float32)
    xc = (jnp.dot(inputs, params["cand_x"],
                  preferred_element_type=jnp.float32)
          + params["cand_b"]).astype(jnp.float32)

    pad_batch = (-batch) % batch_tile
    if pad_batch:
        xg = jnp.pad(xg, ((0, pad_batch), (0, 0), (0, 0)))
        xc = jnp.pad(xc, ((0, pad_batch), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_batch), (0, 0)))
    padded_batch = batch + pad_batch
    grid = (padded_batch // batch_tile,)
    # lane-expand the mask (see kernel comment)
    lane = 128
    mask_lanes = jnp.broadcast_to(
        mask.astype(jnp.float32)[:, :, None],
        (padded_batch, time, lane))

    kernel = functools.partial(
        _gru_scan_kernel, time=time, hidden=hidden, reverse=reverse)
    outputs, final = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((padded_batch, time, hidden),
                                 jnp.float32),
            jax.ShapeDtypeStruct((padded_batch, hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, time, 2 * hidden),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, time, hidden),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, time, lane),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((hidden, 2 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((batch_tile, time, hidden),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((batch_tile, hidden), lambda i: (i, 0)),
        ),
        interpret=pallas_interpret(),
    )(xg, xc, mask_lanes,
      params["gates_h"].astype(jnp.float32),
      params["cand_h"].astype(jnp.float32))

    if pad_batch:
        outputs = outputs[:batch]
        final = final[:batch]
    return outputs.astype(inputs.dtype), final.astype(inputs.dtype)


# Differentiable wrapper: fused Pallas forward, backward via jax.vjp of
# the reference implementation (rematerialized — the standard recipe
# until a hand-written BPTT kernel lands).
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
    out = _gru_scan_pallas(params, inputs, mask, reverse, batch_tile)
    return out, (params, inputs, mask)


def _gru_scan_bwd(reverse, batch_tile, residuals, grads):
    params, inputs, mask = residuals
    _, vjp = jax.vjp(
        lambda p, x, m: _reference_gru_scan(p, x, m, reverse),
        params, inputs, mask)
    return vjp(grads)


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)


def bidirectional_gru_scan(fw_params, bw_params, inputs, mask,
                           batch_tile: int = DEFAULT_BATCH_TILE):
    fw_out, fw_final = gru_scan(fw_params, inputs, mask,
                                reverse=False, batch_tile=batch_tile)
    bw_out, bw_final = gru_scan(bw_params, inputs, mask,
                                reverse=True, batch_tile=batch_tile)
    return (jnp.concatenate([fw_out, bw_out], axis=-1),
            jnp.concatenate([fw_final, bw_final], axis=-1))
