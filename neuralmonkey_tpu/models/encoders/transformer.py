"""Transformer encoder (reference nm/encoders/transformer.py).

Pre-norm residual blocks (LN → self-attention → +res, LN → FFN → +res)
with a final LN; sinusoidal or learned position embeddings. The whole
encoder is straight-line XLA: per-layer fused matmuls on the MXU, no
scans.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...model.sequence import EmbeddedSequence
from ...model.stateful import TemporalStatefulWithOutput
from ...ops import nn
from ...ops.attention import (attention_bias_from_mask, ffn, ffn_init,
                              layer_norm, layer_norm_init, mha_init,
                              multi_head_attention,
                              sinusoidal_position_encoding)
from ...ops.moe import (moe_combine_stats, moe_ffn, moe_init,
                        moe_partition_specs)
from ...ops.sharding import constrain_sequence
from ...vocabulary import Vocabulary

_POSITION_TYPES = ("sinusoidal", "learned", "none")
_maybe_dropout = nn.maybe_dropout


class TransformerEncoder(ModelPart, TemporalStatefulWithOutput):

    def __init__(self, name: str,
                 input_sequence=None,
                 ff_hidden_size: int = None,
                 depth: int = 6,
                 n_heads: int = 8,
                 dropout_keep_prob: float = 0.9,
                 attention_dropout_keep_prob: float = 1.0,
                 position_encoding: str = "sinusoidal",
                 max_position: int = 512,
                 remat: bool = False,
                 pipeline_stages: int = 0,
                 pipeline_microbatches: int = 0,
                 moe_experts: int = 0,
                 moe_top_k: int = 2,
                 moe_capacity_factor: float = 1.5,
                 moe_aux_weight: float = 0.01,
                 moe_router_noise: float = 0.0,
                 moe_z_loss_weight: float = 0.0,
                 # sugar for building the input sequence inline:
                 vocabulary: Vocabulary = None,
                 data_id: str = None,
                 embedding_size: int = None,
                 max_input_len: int = None,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        if input_sequence is None:
            if vocabulary is None or data_id is None \
                    or embedding_size is None:
                raise ValueError(
                    "Provide input_sequence or vocabulary+data_id+"
                    "embedding_size")
            input_sequence = EmbeddedSequence(
                name=f"{name}_input", vocabulary=vocabulary,
                data_id=data_id, embedding_size=embedding_size,
                max_length=max_input_len,
                scale_embeddings_by_depth=True)
        if position_encoding not in _POSITION_TYPES:
            raise ValueError(
                f"position_encoding must be one of {_POSITION_TYPES}")
        self.input_sequence = input_sequence
        self.model_dim = input_sequence.state_dim
        self.ff_hidden_size = ff_hidden_size or 4 * self.model_dim
        self.depth = depth
        self.n_heads = n_heads
        if self.model_dim % n_heads:
            raise ValueError(
                f"model dim {self.model_dim} not divisible by "
                f"{n_heads} heads")
        self.dropout_keep_prob = dropout_keep_prob
        self.attention_dropout_keep_prob = attention_dropout_keep_prob
        self.position_encoding = position_encoding
        self.max_position = max_position
        # jax.checkpoint each layer during training: activations are
        # recomputed in the backward pass instead of living in HBM for
        # the whole step — the standard long-sequence memory lever on
        # TPU (trades ~1/3 extra FLOPs for O(depth) fewer T-sized
        # residuals). Numerics are unchanged (same ops, same rng).
        self.remat = remat
        # GPipe pipeline parallelism (parallel/pipeline.py): layer
        # params stack along a leading axis sharded over the 'pipe'
        # mesh axis, and the layer loop runs as a microbatched
        # pipeline. Requires TPUManager(num_pipeline_stages=S).
        self.pipeline_stages = pipeline_stages
        if pipeline_stages > 1 and depth % pipeline_stages:
            raise ValueError(
                f"depth {depth} not divisible by "
                f"{pipeline_stages} pipeline stages")
        # microbatch count M (default = stage count S); larger M
        # shrinks the GPipe bubble (S-1)/(M+S-1) at the cost of
        # smaller per-tick matmuls
        self.pipeline_microbatches = pipeline_microbatches
        if pipeline_microbatches and pipeline_microbatches < \
                pipeline_stages:
            raise ValueError(
                f"pipeline_microbatches={pipeline_microbatches} must "
                f"be >= pipeline_stages={pipeline_stages}")
        # mixture-of-experts FFN (ops/moe.py): every layer's FFN
        # becomes E expert FFNs + a router; expert weights declare
        # ('expert', ...) partition specs for expert parallelism
        self.moe_experts = moe_experts
        self.moe_top_k = moe_top_k
        self.moe_capacity_factor = moe_capacity_factor
        self.moe_aux_weight = moe_aux_weight
        self.moe_router_noise = moe_router_noise
        self.moe_z_loss_weight = moe_z_loss_weight

    @property
    def state_dim(self) -> int:
        return self.model_dim

    @property
    def output_dim(self) -> int:
        return self.model_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = {}
        if self.position_encoding == "learned":
            rng, sub = jax.random.split(rng)
            params["position_emb"] = jax.random.normal(
                sub, (self.max_position, self.model_dim)) * 0.01
        layers = []
        for i in range(self.depth):
            rng, k1, k2 = jax.random.split(rng, 3)
            layers.append({
                "ln_att": layer_norm_init(self.model_dim),
                "att": mha_init(k1, self.model_dim, self.model_dim,
                                self.model_dim),
                "ln_ff": layer_norm_init(self.model_dim),
                "ff": (moe_init(k2, self.model_dim,
                                self.ff_hidden_size, self.moe_experts)
                       if self.moe_experts > 1
                       else ffn_init(k2, self.model_dim,
                                     self.ff_hidden_size)),
            })
        if self.pipeline_stages > 1:
            # pipeline layout: layer params stacked on a leading axis
            # (declared ('pipe', ...) — each stage holds depth/S layers)
            params["layers"] = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *layers)
        else:
            for i, layer in enumerate(layers):
                params[f"layer_{i}"] = layer
        params["ln_out"] = layer_norm_init(self.model_dim)
        return params

    def param_partition_specs(self) -> Dict[str, tuple]:
        """Tensor-parallel layer sharding (the input sequence's
        embedding table declares its own specs). Semantics are
        unchanged by sharding — GSPMD only changes layout and inserts
        the per-layer psums — so this is purely a scaling declaration.

        With ``pipeline_stages``, the stacked layer params instead
        shard their leading (layer) axis over 'pipe': each stage's
        devices hold only their own layers' weights."""
        from ...ops.attention import (ffn_partition_specs,
                                      mha_partition_specs)
        specs: Dict[str, tuple] = {}
        if self.pipeline_stages > 1:
            # stacked layout: leading (layer) axis over 'pipe'; the
            # trailing dims keep the Megatron 'model' pattern so PP
            # composes with TP (the runtime drops axes the mesh lacks)
            for ln in ("ln_att", "ln_ff"):
                for leaf in ("scale", "bias"):
                    specs[f"layers/{ln}/{leaf}"] = ("pipe", None)
            subs = [("att", ("q", "k", "v"), ("o",))]
            if self.moe_experts <= 1:
                subs.append(("ff", ("in",), ("out",)))
            for sub, cols, rows in subs:
                for p in cols:  # output columns sharded
                    specs[f"layers/{sub}/{p}/w"] = \
                        ("pipe", None, "model")
                    specs[f"layers/{sub}/{p}/b"] = ("pipe", "model")
                for p in rows:  # input rows sharded, psum after
                    specs[f"layers/{sub}/{p}/w"] = \
                        ("pipe", "model", None)
                    specs[f"layers/{sub}/{p}/b"] = ("pipe", None)
            if self.moe_experts > 1:
                # stacked MoE: expert axis follows the layer axis;
                # hidden dims keep the Megatron pattern (EP x PP x TP)
                from ...ops.moe import moe_stacked_partition_specs
                specs.update(moe_stacked_partition_specs("layers/ff"))
            return specs
        for i in range(self.depth):
            specs.update(mha_partition_specs(f"layer_{i}/att"))
            if self.moe_experts > 1:
                specs.update(moe_partition_specs(f"layer_{i}/ff"))
            else:
                specs.update(ffn_partition_specs(f"layer_{i}/ff"))
        return specs

    # ------------------------------------------------------------------ #
    @tensor
    def temporal_mask(self, ctx: Context):
        return self.input_sequence.temporal_mask(ctx)

    def _add_positions(self, params, states):
        time = states.shape[1]
        if self.position_encoding == "sinusoidal":
            return states + sinusoidal_position_encoding(
                time, self.model_dim, states.dtype)[None]
        if self.position_encoding == "learned":
            return states + params["position_emb"][None, :time]
        return states

    def _layer_fn(self, layer, states, mask, rngs, moe_stats=False):
        """One encoder layer as a pure function (rngs may hold None
        entries outside train mode) so it can ride ``jax.checkpoint``.
        ``moe_stats=True`` returns the MoE aux as RAW routing sums
        (for the GPipe executor's cross-microbatch accumulation)
        instead of the combined balance/z losses."""
        normed = layer_norm(layer["ln_att"], states)
        att_out = multi_head_attention(
            layer["att"], normed, normed, normed, self.n_heads,
            None, rngs["att"], self.attention_dropout_keep_prob,
            key_mask=mask)
        att_out = _maybe_dropout(att_out, self.dropout_keep_prob,
                                 rngs["res_att"])
        # sequence parallelism (no-op unless enabled): the residual
        # stream between blocks shards its time axis over 'model'
        states = constrain_sequence(states + att_out)

        normed = layer_norm(layer["ln_ff"], states)
        if self.moe_experts > 1:
            ff_out, aux = moe_ffn(
                layer["ff"], normed, mask=mask,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout_rng=rngs["ff"],
                dropout_keep_prob=self.dropout_keep_prob,
                router_noise=self.moe_router_noise,
                noise_rng=rngs.get("moe_noise"),
                return_stats=moe_stats)
            ff_out = _maybe_dropout(ff_out, self.dropout_keep_prob,
                                    rngs["res_ff"])
            return constrain_sequence(states + ff_out), aux
        ff_out = ffn(layer["ff"], normed, dropout_rng=rngs["ff"],
                     dropout_keep_prob=self.dropout_keep_prob)
        ff_out = _maybe_dropout(ff_out, self.dropout_keep_prob,
                                rngs["res_ff"])
        return constrain_sequence(states + ff_out)

    def _layer_rngs(self, ctx: Context, i: int):
        """Per-layer dropout rngs, drawn OUTSIDE the layer body (fixed
        fold_in sites — the remat on/off invariant depends on this)."""
        res_drop = ctx.train and self.dropout_keep_prob < 1.0
        return {
            "att": (ctx.make_rng(self, f"att_drop_{i}")
                    if ctx.train
                    and self.attention_dropout_keep_prob < 1.0
                    else None),
            "ff": (ctx.make_rng(self, f"ff_drop_{i}")
                   if res_drop else None),
            "res_att": (ctx.make_rng(self, f"res_drop_att_{i}")
                        if res_drop else None),
            "res_ff": (ctx.make_rng(self, f"res_drop_ff_{i}")
                       if res_drop else None),
            "moe_noise": (ctx.make_rng(self, f"moe_noise_{i}")
                          if ctx.train and self.moe_experts > 1
                          and self.moe_router_noise > 0.0 else None),
        }

    def _pipelined_layers(self, ctx: Context, params, states, mask):
        """Run the stacked layer stack through the GPipe executor; see
        parallel/pipeline.py. Falls back to a sequential loop over the
        stacked layout when no pipeline mesh is registered (e.g. a
        pipelined config opened on a single device) or the batch does
        not divide into microbatches."""
        from ...parallel.pipeline import gpipe_apply, pipeline_mesh
        mesh = pipeline_mesh()
        batch = states.shape[0]
        moe = self.moe_experts > 1
        n_micro = self.pipeline_microbatches or (
            mesh.shape["pipe"] if mesh is not None
            else self.pipeline_stages)
        dp = mesh.shape.get("data", 1) if mesh is not None else 1
        if (mesh is None or batch % n_micro
                or (batch // n_micro) % dp):
            layer_fn = (jax.checkpoint(self._layer_fn)
                        if self.remat and ctx.train else self._layer_fn)
            balance_total, z_total = 0.0, 0.0
            for i in range(self.depth):
                layer = jax.tree_util.tree_map(
                    lambda a, i=i: a[i], params["layers"])
                out = layer_fn(layer, states, mask,
                               self._layer_rngs(ctx, i))
                if moe:
                    states, aux = out
                    balance_total = balance_total + aux["balance"]
                    z_total = z_total + aux["z"]
                else:
                    states = out
            self._add_moe_losses(ctx, balance_total, z_total)
            return states

        att_drop = (ctx.train
                    and self.attention_dropout_keep_prob < 1.0)
        res_drop = ctx.train and self.dropout_keep_prob < 1.0
        noise = (ctx.train and moe and self.moe_router_noise > 0.0)
        per_layer = None
        if att_drop or res_drop or noise:
            # stacked per-layer keys, folded with the microbatch
            # ordinal inside the layer so each microbatch draws its
            # own dropout mask (a different rng layout than the
            # sequential path — dropout is sampling either way)
            sites = ["att", "ff", "res_att", "res_ff"]
            if noise:
                sites.append("moe_noise")
            per_layer = {
                site: jnp.stack([
                    ctx.make_rng(self, f"pipe_{site}_{i}")
                    for i in range(self.depth)])
                for site in sites}
        # every example carries its microbatch ordinal so the layer
        # can recover it after the batch split
        mb_ord = jnp.repeat(jnp.arange(n_micro), batch // n_micro)

        def layer_fn(layer_p, layer_a, h, aux):
            if layer_a is None:
                rngs = {s: None for s in
                        ("att", "ff", "res_att", "res_ff",
                         "moe_noise")}
            else:
                mb = aux["mb"][0]

                def fold(site, gate):
                    return (jax.random.fold_in(layer_a[site], mb)
                            if gate else None)
                rngs = {
                    "att": fold("att", att_drop),
                    "ff": fold("ff", res_drop),
                    "res_att": fold("res_att", res_drop),
                    "res_ff": fold("res_ff", res_drop),
                    "moe_noise": fold("moe_noise", noise),
                }
            return self._layer_fn(layer_p, h, aux["mask"], rngs,
                                  moe_stats=moe)

        if self.remat and ctx.train:
            layer_fn = jax.checkpoint(layer_fn)
        out = gpipe_apply(layer_fn, params["layers"], per_layer,
                          states, {"mask": mask, "mb": mb_ord},
                          n_microbatches=n_micro,
                          aux_fn=moe_combine_stats if moe else None)
        if moe:
            # the executor accumulated each layer's routing sums over
            # all microbatches before folding, so these totals equal
            # the sequential stack's (exact full-batch balance/z)
            states, aux = out
            self._add_moe_losses(ctx, aux["balance"], aux["z"])
            return states
        return out

    def _add_moe_losses(self, ctx: Context, balance_total, z_total):
        if self.moe_experts > 1 and ctx.train:
            ctx.add_aux_loss(
                self, "moe_balance",
                self.moe_aux_weight * balance_total / self.depth)
            if self.moe_z_loss_weight > 0.0:
                ctx.add_aux_loss(
                    self, "moe_z",
                    self.moe_z_loss_weight * z_total / self.depth)

    @tensor
    def temporal_states(self, ctx: Context):
        params = ctx.get_params(self)
        states = self.input_sequence.temporal_states(ctx)
        mask = self.input_sequence.temporal_mask(ctx)

        states = self._add_positions(params, states)
        states = ctx.dropout(self, states, self.dropout_keep_prob,
                             "input_dropout")
        states = constrain_sequence(states)
        if self.pipeline_stages > 1:
            states = self._pipelined_layers(ctx, params, states, mask)
        else:
            layer_fn = (jax.checkpoint(self._layer_fn)
                        if self.remat and ctx.train else self._layer_fn)
            balance_total, z_total = 0.0, 0.0
            for i in range(self.depth):
                out = layer_fn(params[f"layer_{i}"], states, mask,
                               self._layer_rngs(ctx, i))
                if self.moe_experts > 1:
                    states, aux = out
                    balance_total = balance_total + aux["balance"]
                    z_total = z_total + aux["z"]
                else:
                    states = out
            self._add_moe_losses(ctx, balance_total, z_total)

        states = layer_norm(params["ln_out"], states)
        # zero out padding positions for clean downstream pooling
        return states * mask[..., None]

    @tensor
    def output(self, ctx: Context):
        """Masked mean-pool over time (the reference's encoder output)."""
        states = self.temporal_states(ctx)
        mask = self.temporal_mask(ctx)
        total = jnp.sum(states, axis=1)
        count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return total / count
