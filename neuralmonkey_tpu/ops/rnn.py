"""Masked recurrent scans over time.

The TPU-native replacement for the reference's
``tf.nn.bidirectional_dynamic_rnn`` (used by nm/encoders/recurrent.py):
a ``lax.scan`` over the time axis with mask-gated state carry. Padding
positions leave the hidden state untouched, so the final carry equals
the state at each sequence's last real token — no host-side length
bookkeeping. A fused Pallas scan kernel can be swapped in behind the
same signature (see ops/pallas_rnn.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pallas_cell_kind(cell):
    """'gru' / 'lstm' when a fused Pallas scan implements this exact
    cell's equations, else None."""
    from .kernel_config import use_pallas
    from .nn import GRUCell, LayerNormGRUCell, LSTMCell, NoisyGRUCell
    if not use_pallas():
        return None
    # plain GRU equations only (Ortho differs in init, not math)
    if (type(cell).__name__ in ("GRUCell", "OrthoGRUCell")
            and isinstance(cell, GRUCell)
            and not isinstance(cell, (LayerNormGRUCell, NoisyGRUCell))):
        return "gru"
    if type(cell).__name__ == "LSTMCell" and isinstance(cell, LSTMCell):
        return "lstm"
    return None


def _sharded_scan(scan_fn, params, inputs, mask, *static):
    """Dispatch a fused Pallas scan, shard_map-wrapping it per data
    shard on a multi-device mesh (kernel_config.note_mesh rationale):
    params ride replicated (their BPTT cotangents are psummed over the
    manual axes by the shard_map transpose), inputs/outputs split
    their batch axis over 'data'. Returns None when the batch does not
    divide the data axis — the caller falls back to the XLA scan."""
    from .kernel_config import spmd_wrap_plan
    plan = spmd_wrap_plan()
    if plan is None:
        return scan_fn(params, inputs, mask, *static)
    if inputs.shape[0] % plan.data:
        return None
    from jax.sharding import PartitionSpec as P
    pspec = jax.tree_util.tree_map(lambda _: P(), params)

    def body(p, x, m):
        return scan_fn(p, x, m, *static)

    wrapped = plan.shard_map(
        body,
        in_specs=(pspec, P("data", None, None), P("data", None)),
        out_specs=(P("data", None, None), P("data", None)))
    return wrapped(params, inputs, mask)


def unidirectional_rnn(cell, params, inputs: jnp.ndarray,
                       mask: jnp.ndarray,
                       reverse: bool = False,
                       noise_rng=None,
                       allow_pallas: bool = True
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run `cell` over `inputs` (B, T, D) with `mask` (B, T).

    Returns ``(outputs (B, T, H), final_output (B, H))``. With
    ``reverse=True`` the sequence is processed right-to-left (respecting
    the mask: trailing padding is skipped by the state gating) and the
    outputs are returned re-aligned to the original time order.

    ``noise_rng`` (noisy-activation cells, training only) is folded
    with the timestep index so every step draws fresh noise.

    On TPU with plain GRU cells, dispatches to the fused Pallas scan
    (ops/pallas_rnn.py) — same semantics, state + recurrent weights
    pinned in VMEM.
    """
    # The Pallas scan is differentiable via a hand-written BPTT kernel
    # (ops/pallas_rnn.py); training eligibility is decided by callers
    # through allow_pallas (kernel_config.use_pallas_train gate)
    if (allow_pallas and noise_rng is None
            and inputs.dtype in (jnp.float32, jnp.bfloat16)
            and all(p.dtype in (jnp.float32, jnp.bfloat16)
                    for p in jax.tree_util.tree_leaves(params))):
        kind = _pallas_cell_kind(cell)
        if kind == "gru":
            from .pallas_rnn import fits_vmem, gru_scan
            if fits_vmem(inputs.shape[1], cell.hidden_dim):
                # bf16 policy: the hoisted input matmuls ride the bf16
                # MXU; the serial kernel computes f32 internally and
                # returns f32 states — exactly the XLA path's
                # f32-carry semantics
                res = _sharded_scan(gru_scan, params, inputs, mask,
                                    reverse)
                if res is not None:
                    return res
        elif kind == "lstm":
            from .pallas_rnn import lstm_fits_vmem, lstm_scan
            if lstm_fits_vmem(inputs.shape[1], cell.hidden_dim):
                res = _sharded_scan(lstm_scan, params, inputs, mask,
                                    reverse, cell.forget_bias)
                if res is not None:
                    return res
    batch = inputs.shape[0]
    time = inputs.shape[1]
    x_tm = jnp.swapaxes(inputs, 0, 1)          # (T, B, D)
    m_tm = jnp.swapaxes(mask, 0, 1)[..., None]  # (T, B, 1)
    if reverse:
        x_tm = jnp.flip(x_tm, axis=0)
        m_tm = jnp.flip(m_tm, axis=0)

    # hidden states accumulate in f32 regardless of the activation
    # policy (bf16 inputs still produce f32 states via the f32-pinned
    # matmul accumulation — the scan carry must match that)
    state_dtype = (jnp.float32 if inputs.dtype == jnp.bfloat16
                   else inputs.dtype)
    init_state = cell.initial_state(batch, state_dtype)
    steps = jnp.arange(time)

    def step(state, xmt):
        x_t, m_t, t = xmt
        if noise_rng is not None:
            new_state, out = cell(
                params, state, x_t,
                noise_rng=jax.random.fold_in(noise_rng, t))
        else:
            new_state, out = cell(params, state, x_t)
        # carry previous state through padding positions
        gated = jax.tree_util.tree_map(
            lambda new, old: m_t * new + (1.0 - m_t) * old,
            new_state, state)
        gated_out = m_t * out
        return gated, gated_out

    final_state, outputs_tm = jax.lax.scan(
        step, init_state, (x_tm, m_tm, steps))
    if reverse:
        outputs_tm = jnp.flip(outputs_tm, axis=0)
    outputs = jnp.swapaxes(outputs_tm, 0, 1)
    return outputs, cell.output(final_state)


def bidirectional_rnn(fw_cell, fw_params, bw_cell, bw_params,
                      inputs: jnp.ndarray, mask: jnp.ndarray,
                      noise_rng=None,
                      allow_pallas: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional RNN; concatenates directions on the feature axis.

    Returns ``(outputs (B, T, Hf+Hb), final (B, Hf+Hb))``.
    """
    if noise_rng is not None:
        fw_rng, bw_rng = jax.random.split(noise_rng)
    else:
        fw_rng = bw_rng = None
    fw_out, fw_final = unidirectional_rnn(
        fw_cell, fw_params, inputs, mask, reverse=False,
        noise_rng=fw_rng, allow_pallas=allow_pallas)
    bw_out, bw_final = unidirectional_rnn(
        bw_cell, bw_params, inputs, mask, reverse=True,
        noise_rng=bw_rng, allow_pallas=allow_pallas)
    outputs = jnp.concatenate([fw_out, bw_out], axis=-1)
    final = jnp.concatenate([fw_final, bw_final], axis=-1)
    return outputs, final
