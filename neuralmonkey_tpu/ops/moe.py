"""Mixture-of-experts FFN with expert parallelism.

The reference framework (nm/encoders/transformer.py) has only the
dense position-wise FFN; MoE is a TPU-native scaling extension in the
spirit of SURVEY.md §6's mesh design (GShard / Switch Transformer
style). A transformer FFN is replaced by E expert FFNs plus a learned
router; each token is dispatched to its top-k experts subject to a
fixed per-expert capacity (static shapes — XLA sees no data-dependent
sizes, the routing is all one-hot matmuls on the MXU).

Expert weights stack on a leading E axis declared ``('expert', ...)``
(see :func:`moe_partition_specs`); under
``TPUManager(num_expert_shards=S)`` the ('data', 'expert') mesh places
E/S experts per device group and GSPMD inserts the dispatch/return
all-to-alls from the sharding annotations alone — the
:func:`constrain_dispatch` hints pin the expert-major intermediates to
the 'expert' axis so the expert matmuls run expert-parallel.

Routing follows GShard's grouped dense-dispatch formulation: tokens
are grouped (one group per batch row for (B, T, D) inputs), positions
within an expert's capacity buffer come from a cumulative sum in
slot-major order (every token's first choice beats any token's second
choice), and tokens that overflow an expert's capacity contribute
nothing — the transformer's residual connection carries them through
unchanged. The auxiliary load-balancing loss is the Switch Transformer
one: E * sum_e(load_fraction_e * mean_router_prob_e), == 1 at perfect
balance.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import nn

_EXPERT_MESH = None


def enable_expert_sharding(mesh: object) -> None:
    """Register the mesh whose 'expert' axis MoE intermediates should
    shard over (done by TPUManager(num_expert_shards > 1))."""
    global _EXPERT_MESH
    _EXPERT_MESH = mesh


def disable_expert_sharding() -> None:
    global _EXPERT_MESH
    _EXPERT_MESH = None


def expert_sharding_mesh():
    return _EXPERT_MESH


def constrain_dispatch(x, expert_axis: int = 0, group_axis: int = 1):
    """Constrain an expert-major intermediate (E, G, C, D) to shard
    its expert axis over 'expert' AND its group (batch) axis over
    'data' — without the latter every data shard would redundantly
    run the expert FFN on the full global batch (the None in the spec
    pins the axis replicated, forcing an all-gather of the dispatched
    tokens). Decode steps pass a single group (G=1, not divisible by
    the data axis), which legitimately replicates. No-op without a
    registered mesh."""
    if _EXPERT_MESH is None:
        return x
    spec = [None] * x.ndim
    spec[expert_axis] = "expert"
    dp = _EXPERT_MESH.shape.get("data", 1)
    if dp > 1 and x.shape[group_axis] % dp == 0:
        spec[group_axis] = "data"
    sharding = jax.sharding.NamedSharding(
        _EXPERT_MESH, jax.sharding.PartitionSpec(*spec))
    return jax.lax.with_sharding_constraint(x, sharding)


def moe_init(rng, model_dim: int, hidden_dim: int,
             n_experts: int) -> Dict:
    """Router + E stacked expert FFNs (leading axis = expert)."""
    k_router, k_in, k_out = jax.random.split(rng, 3)

    def stack_linear(key, in_dim, out_dim):
        keys = jax.random.split(key, n_experts)
        ws = [nn.linear_init(k, in_dim, out_dim)["w"] for k in keys]
        return {"w": jnp.stack(ws),
                "b": jnp.zeros((n_experts, out_dim))}

    return {
        "router": nn.linear_init(k_router, model_dim, n_experts,
                                 use_bias=False),
        "in": stack_linear(k_in, model_dim, hidden_dim),
        "out": stack_linear(k_out, hidden_dim, model_dim),
    }


def moe_partition_specs(prefix: str) -> Dict[str, tuple]:
    """Expert-parallel specs for a ``moe_init`` subtree: expert
    weights split their leading (expert) axis over the 'expert' mesh
    axis; the router replicates (every device routes its own tokens).
    The hidden dim additionally carries the Megatron 'model' pattern
    (in-columns / out-rows) so EP composes with TP on a
    ('data', 'expert', 'model') mesh — the runtime drops axes the
    mesh lacks."""
    return {f"{prefix}/in/w": ("expert", None, "model"),
            f"{prefix}/in/b": ("expert", "model"),
            f"{prefix}/out/w": ("expert", "model", None),
            f"{prefix}/out/b": ("expert", None)}


def moe_stacked_partition_specs(prefix: str) -> Dict[str, tuple]:
    """Pipeline-stacked MoE specs (EP x PP): the leading LAYER axis
    shards over 'pipe', then the :func:`moe_partition_specs` pattern
    (expert axis + Megatron 'model' dims) — each pipeline stage holds
    only its own layers' expert weights, themselves split over the
    'expert' groups. The router is declared too so its stacked layers
    follow their stage."""
    out = {k: ("pipe",) + v
           for k, v in moe_partition_specs(prefix).items()}
    out[f"{prefix}/router/w"] = ("pipe", None, None)
    return out


def moe_capacity(group_size: int, n_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert capacity per token group."""
    return max(1, min(group_size, int(math.ceil(
        capacity_factor * top_k * group_size / n_experts))))


def moe_combine_stats(stats: Dict[str, jnp.ndarray]
                      ) -> Dict[str, jnp.ndarray]:
    """Fold the raw routing sums from ``moe_ffn(return_stats=True)``
    into the loss scalars. The sums are linear in the tokens, so they
    can be accumulated across microbatches first (the GPipe executor
    does exactly this) and combined once — giving the EXACT full-batch
    balance/z losses regardless of how the batch was split."""
    count = jnp.maximum(stats["count"], 1.0)
    load = stats["top1_sum"] / count
    prob_mean = stats["prob_sum"] / count
    n_experts = stats["top1_sum"].shape[-1]
    return {"balance": n_experts * jnp.sum(load * prob_mean),
            "z": stats["z_sum"] / count}


def moe_ffn(params: Dict, x: jnp.ndarray,
            mask: Optional[jnp.ndarray] = None,
            top_k: int = 2,
            capacity_factor: float = 1.5,
            activation=jax.nn.relu,
            dropout_rng=None,
            dropout_keep_prob: float = 1.0,
            router_noise: float = 0.0,
            noise_rng=None,
            return_stats: bool = False
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mixture-of-experts position-wise FFN.

    Args:
      params: a ``moe_init`` subtree.
      x: (G, S, D) tokens — group-major (one group per batch row in
        the transformer; decode steps pass one group of B tokens).
      mask: optional (G, S) validity mask; padding tokens are neither
        dispatched nor counted in the balance loss.
      top_k: experts per token (chosen gates renormalize to sum 1).
      capacity_factor: slack over the perfectly-balanced per-expert
        load; overflowing tokens produce zero output (the caller's
        residual connection carries them).
      router_noise: train-time multiplicative jitter on the router
        input (Switch Transformer's exploration trick — uniform in
        [1-eps, 1+eps]); active only when ``noise_rng`` is given.

    Returns (output (G, S, D), aux dict of f32 scalars):
      ``balance`` — Switch load-balance loss (1 at perfect balance);
      ``z`` — router z-loss, mean over valid tokens of
      logsumexp(logits)² (penalizes drifting logit scales).
      With ``return_stats=True`` the aux dict instead holds the RAW
      sums behind those losses (``top1_sum``/``prob_sum`` (E,),
      ``count``/``z_sum`` scalars) — linear in the tokens, so a caller
      that splits the batch (GPipe microbatching) can accumulate them
      and fold once via :func:`moe_combine_stats` for the exact
      full-batch losses.

    Memory: the dense dispatch/combine tensors are (G, S, E, C) — at
    the framework's sentence lengths (<= ~512 BPE tokens, SURVEY.md
    §6) this stays well under the per-step activation budget (e.g.
    B=64, T=512, E=8, k=2: ~0.4 GB transient f32, less under the bf16
    policy). Sort-based token dropping would trade the one-hots for
    gathers if much longer contexts ever become a target.
    """
    g, s, d = x.shape
    w_in, b_in = params["in"]["w"], params["in"]["b"]
    w_out, b_out = params["out"]["w"], params["out"]["b"]
    n_experts = w_in.shape[0]
    k = min(top_k, n_experts)
    cap = moe_capacity(s, n_experts, k, capacity_factor)

    # routing runs float32 regardless of the compute policy (softmax /
    # cumsum headroom; the router matmul is tiny)
    router_in = x.astype(jnp.float32)
    if noise_rng is not None and router_noise > 0.0:
        router_in = router_in * jax.random.uniform(
            noise_rng, router_in.shape,
            minval=1.0 - router_noise, maxval=1.0 + router_noise)
    logits = jnp.einsum(
        "gsd,de->gse", router_in,
        params["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)

    gate_vals, gate_idx = jax.lax.top_k(probs, k)      # (G, S, k)
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)
    sel = jax.nn.one_hot(gate_idx, n_experts,
                         dtype=jnp.float32)            # (G, S, k, E)
    if mask is not None:
        sel = sel * mask[..., None, None].astype(jnp.float32)

    # capacity positions in slot-major order: all first choices rank
    # before any second choice, so overflow drops lower-priority slots
    sel_flat = sel.transpose(0, 2, 1, 3).reshape(
        g, k * s, n_experts)                           # (G, kS, E)
    pos = jnp.cumsum(sel_flat, axis=1) - sel_flat
    kept = sel_flat * (pos < cap)
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                            dtype=jnp.float32)
    dispatch_flat = kept[..., None] * pos_oh           # (G, kS, E, C)
    gates_flat = gate_vals.transpose(0, 2, 1).reshape(g, k * s)
    combine_flat = gates_flat[..., None, None] * dispatch_flat
    # fold the k slots back onto the token axis
    dispatch = dispatch_flat.reshape(
        g, k, s, n_experts, cap).sum(axis=1)           # (G, S, E, C)
    combine = combine_flat.reshape(
        g, k, s, n_experts, cap).sum(axis=1)

    # expert compute (expert-major; sharded over 'expert' when a mesh
    # is registered — GSPMD turns the dispatch/combine einsums into
    # all-to-alls)
    dispatch = dispatch.astype(x.dtype)
    combine = combine.astype(x.dtype)
    expert_in = constrain_dispatch(
        jnp.einsum("gsec,gsd->egcd", dispatch, x))
    hidden = activation(
        jnp.einsum("egcd,edh->egch", expert_in, w_in)
        + b_in[:, None, None, :].astype(expert_in.dtype))
    if dropout_rng is not None and dropout_keep_prob < 1.0:
        hidden = nn.dropout(hidden, dropout_keep_prob, dropout_rng,
                            True)
    expert_out = constrain_dispatch(
        jnp.einsum("egch,ehd->egcd", hidden, w_out)
        + b_out[:, None, None, :].astype(hidden.dtype))
    y = jnp.einsum("gsec,egcd->gsd", combine, expert_out)

    # Switch load-balance loss over valid tokens: top-1 load fraction
    # x mean router prob, scaled so perfect balance scores 1
    top1 = sel[:, :, 0, :]                             # (G, S, E)
    z_sq = jax.nn.logsumexp(logits, axis=-1) ** 2      # (G, S)
    if mask is not None:
        m = mask.astype(jnp.float32)
        stats = {
            "top1_sum": jnp.sum(top1, axis=(0, 1)),
            "prob_sum": jnp.sum(probs * m[..., None], axis=(0, 1)),
            "count": jnp.sum(m),
            "z_sum": jnp.sum(z_sq * m),
        }
    else:
        stats = {
            "top1_sum": jnp.sum(top1, axis=(0, 1)),
            "prob_sum": jnp.sum(probs, axis=(0, 1)),
            "count": jnp.asarray(float(g * s), jnp.float32),
            "z_sum": jnp.sum(z_sq),
        }
    if return_stats:
        return y.astype(x.dtype), stats
    return y.astype(x.dtype), moe_combine_stats(stats)
