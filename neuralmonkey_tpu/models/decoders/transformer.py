"""Transformer decoder (reference nm/decoders/transformer.py).

Teacher-forced training is one straight-line causal pass (no scan —
the MXU sees full (B·T, D) matmuls). Incremental decoding implements
the AutoregressiveDecoder decode contract with per-layer KV caches in
the loop state (written via dynamic_update_slice at static max length,
future positions masked), and per-layer cross-attention K/V projected
once per sentence in ``decode_constants`` — so beam search and greedy
share the same on-device step.

Multiple encoders attend sequentially (the reference's multi-source
serial strategy).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...model.part import Context, ModelPart, tensor
from ...ops import nn
from ...ops.attention import (NEG_INF, attention_bias_from_mask,
                              causal_bias, dot_product_attention, ffn,
                              ffn_init, layer_norm, layer_norm_init,
                              merge_heads, mha_init,
                              multi_head_attention,
                              sinusoidal_position_encoding, split_heads)
from ...ops.moe import (moe_combine_stats, moe_ffn, moe_init,
                        moe_partition_specs)
from ...ops.nn import maybe_dropout as _maybe_dropout
from ...ops.sharding import constrain_sequence
from .autoregressive import AutoregressiveDecoder


class TransformerDecoder(AutoregressiveDecoder):

    def __init__(self, name: str,
                 vocabulary,
                 data_id: str,
                 max_output_len: int,
                 encoders: List = None,
                 encoder=None,
                 ff_hidden_size: int = None,
                 depth: int = 6,
                 n_heads_self: int = 8,
                 n_heads_enc: int = 8,
                 embedding_size: int = None,
                 embeddings_source=None,
                 tie_embeddings: bool = True,
                 label_smoothing: float = None,
                 dropout_keep_prob: float = 0.9,
                 attention_dropout_keep_prob: float = 1.0,
                 supress_unk: bool = False,
                 remat: bool = False,
                 pipeline_stages: int = 0,
                 pipeline_microbatches: int = 0,
                 moe_experts: int = 0,
                 moe_top_k: int = 2,
                 moe_capacity_factor: float = 1.5,
                 moe_aux_weight: float = 0.01,
                 moe_router_noise: float = 0.0,
                 moe_z_loss_weight: float = 0.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        super().__init__(
            name=name, vocabulary=vocabulary, data_id=data_id,
            max_output_len=max_output_len,
            dropout_keep_prob=dropout_keep_prob,
            embedding_size=embedding_size,
            embeddings_source=embeddings_source,
            tie_embeddings=tie_embeddings,
            label_smoothing=label_smoothing, supress_unk=supress_unk,
            reuse=reuse, save_checkpoint=save_checkpoint,
            load_checkpoint=load_checkpoint)
        if encoders is None:
            encoders = [encoder] if encoder is not None else []
        self.encoders = encoders
        self.model_dim = self.embedding_size
        self.ff_hidden_size = ff_hidden_size or 4 * self.model_dim
        self.depth = depth
        self.n_heads_self = n_heads_self
        self.n_heads_enc = n_heads_enc
        self.attention_dropout_keep_prob = attention_dropout_keep_prob
        # jax.checkpoint each layer in the teacher-forced train pass
        # (see TransformerEncoder.remat); the incremental decode path
        # is unaffected (no backward pass there)
        self.remat = remat
        # GPipe pipeline parallelism for the teacher-forced pass (see
        # TransformerEncoder.pipeline_stages); the incremental decode
        # path indexes the stacked layers sequentially
        self.pipeline_stages = pipeline_stages
        if pipeline_stages > 1 and depth % pipeline_stages:
            raise ValueError(
                f"depth {depth} not divisible by "
                f"{pipeline_stages} pipeline stages")
        # microbatch count M (see TransformerEncoder)
        self.pipeline_microbatches = pipeline_microbatches
        if pipeline_microbatches and pipeline_microbatches < \
                pipeline_stages:
            raise ValueError(
                f"pipeline_microbatches={pipeline_microbatches} must "
                f"be >= pipeline_stages={pipeline_stages}")
        # mixture-of-experts FFN (ops/moe.py; see TransformerEncoder)
        self.moe_experts = moe_experts
        self.moe_top_k = moe_top_k
        self.moe_capacity_factor = moe_capacity_factor
        self.moe_aux_weight = moe_aux_weight
        self.moe_router_noise = moe_router_noise
        self.moe_z_loss_weight = moe_z_loss_weight
        if self.model_dim % n_heads_self or (
                encoders and self.model_dim % n_heads_enc):
            raise ValueError("model dim must divide the head counts")
        # transformer convention: scale target embeddings by sqrt(d)
        self.embeddings.scale_embeddings_by_depth = True

    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        layers = []
        for i in range(self.depth):
            rng, k_self, k_ff = jax.random.split(rng, 3)
            layer = {
                "ln_self": layer_norm_init(self.model_dim),
                "self_att": mha_init(k_self, self.model_dim,
                                     self.model_dim, self.model_dim),
                "ln_ff": layer_norm_init(self.model_dim),
                "ff": moe_init(k_ff, self.model_dim,
                               self.ff_hidden_size, self.moe_experts)
                if self.moe_experts > 1
                else ffn_init(k_ff, self.model_dim,
                               self.ff_hidden_size),
            }
            for e, enc in enumerate(self.encoders):
                rng, k_cross = jax.random.split(rng)
                layer[f"ln_cross_{e}"] = layer_norm_init(self.model_dim)
                layer[f"cross_att_{e}"] = mha_init(
                    k_cross, self.model_dim, enc.state_dim,
                    self.model_dim)
            layers.append(layer)
        if self.pipeline_stages > 1:
            # pipeline layout: stacked on a leading axis declared
            # ('pipe', ...); see TransformerEncoder.init_params
            params["layers"] = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *layers)
        else:
            for i, layer in enumerate(layers):
                params[f"layer_{i}"] = layer
        params["ln_out"] = layer_norm_init(self.model_dim)
        if not self.tie_embeddings:
            rng, k_logit = jax.random.split(rng)
            params["logit"] = nn.linear_init(
                k_logit, self.model_dim, len(self.vocabulary))
        else:
            params["logit_bias"] = jnp.zeros((len(self.vocabulary),))
        return params

    def param_partition_specs(self) -> Dict[str, tuple]:
        """Tensor-parallel layer sharding on top of the base class's
        vocab-sized logit specs: self/cross attention projections and
        the FFN shard Megatron-style over the 'model' axis (see
        ops/attention.mha_partition_specs). With ``pipeline_stages``,
        the stacked layer params shard their leading (layer) axis over
        'pipe' instead."""
        from ...ops.attention import (ffn_partition_specs,
                                      mha_partition_specs)
        specs = dict(super().param_partition_specs())
        if self.pipeline_stages > 1:
            # stacked layout with the Megatron 'model' pattern on the
            # trailing dims so PP composes with TP (see the encoder)
            lns = ["ln_self", "ln_ff"] + [
                f"ln_cross_{e}" for e in range(len(self.encoders))]
            atts = ["self_att"] + [
                f"cross_att_{e}" for e in range(len(self.encoders))]
            for ln in lns:
                for leaf in ("scale", "bias"):
                    specs[f"layers/{ln}/{leaf}"] = ("pipe", None)
            subs = [(a, ("q", "k", "v"), ("o",)) for a in atts]
            if self.moe_experts <= 1:
                subs.append(("ff", ("in",), ("out",)))
            for sub, cols, rows in subs:
                for p in cols:
                    specs[f"layers/{sub}/{p}/w"] = \
                        ("pipe", None, "model")
                    specs[f"layers/{sub}/{p}/b"] = ("pipe", "model")
                for p in rows:
                    specs[f"layers/{sub}/{p}/w"] = \
                        ("pipe", "model", None)
                    specs[f"layers/{sub}/{p}/b"] = ("pipe", None)
            if self.moe_experts > 1:
                # stacked MoE: expert axis follows the layer axis
                from ...ops.moe import moe_stacked_partition_specs
                specs.update(moe_stacked_partition_specs("layers/ff"))
            return specs
        for i in range(self.depth):
            specs.update(mha_partition_specs(f"layer_{i}/self_att"))
            for e in range(len(self.encoders)):
                specs.update(
                    mha_partition_specs(f"layer_{i}/cross_att_{e}"))
            if self.moe_experts > 1:
                specs.update(moe_partition_specs(f"layer_{i}/ff"))
            else:
                specs.update(ffn_partition_specs(f"layer_{i}/ff"))
        return specs

    def _decode_ffn(self, layer, normed, row_valid=None):
        """FFN at an incremental decode step ((rows, 1, D) current
        tokens). MoE decode routes WITHOUT token dropping (capacity =
        group size): capacity competition at inference would make a
        sentence's output depend on the other rows sharing its batch —
        including batch-padding rows — breaking the padding-inertness
        and in-order-alignment invariants (utils/batching.py). No-drop
        top-k costs E/(k*cf) more decode-FFN FLOPs than the train-time
        capacity-limited dispatch; decode is selection/cache-bound, so
        this is noise. ``row_valid`` (rows,) additionally masks pad
        rows out of routing entirely. The balance loss is discarded
        (no training here)."""
        if self.moe_experts > 1:
            mask = row_valid[None, :] if row_valid is not None else None
            k = min(self.moe_top_k, self.moe_experts)
            out, _ = moe_ffn(layer["ff"], normed.transpose(1, 0, 2),
                             mask=mask,
                             top_k=self.moe_top_k,
                             capacity_factor=self.moe_experts / k)
            return out.transpose(1, 0, 2)
        return ffn(layer["ff"], normed)

    def _layer_params(self, params, i: int):
        """Layer ``i``'s param subtree under either layout (per-layer
        dicts, or the pipeline's stacked leading axis)."""
        if self.pipeline_stages > 1:
            return jax.tree_util.tree_map(lambda a: a[i],
                                          params["layers"])
        return params[f"layer_{i}"]

    def _logits_from_states(self, params, embed_table, states):
        if self.tie_embeddings:
            # undo the sqrt(d) embedding scale for the output projection
            return (jnp.dot(states, embed_table.T,
                            preferred_element_type=jnp.float32)
                    + params["logit_bias"])
        return nn.linear(params["logit"], states)

    # ------------------------------------------------------------------ #
    # teacher-forced training (fully parallel)
    # ------------------------------------------------------------------ #
    def _train_layer_fn(self, layer, x, all_keys_mask, enc_data, rngs,
                        moe_mask=None, moe_stats=False):
        """One decoder layer (self-att → cross-atts → FFN) as a pure
        function of its arguments, remat-wrappable (see encoder)."""
        normed = layer_norm(layer["ln_self"], x)
        att = multi_head_attention(
            layer["self_att"], normed, normed, normed,
            self.n_heads_self, None, rngs["self_att"],
            self.attention_dropout_keep_prob,
            key_mask=all_keys_mask, causal=True)
        # sequence parallelism (no-op unless enabled): residual stream
        # between blocks shards its time axis over 'model'
        x = constrain_sequence(
            x + _maybe_dropout(att, self.dropout_keep_prob,
                               rngs["res_self"]))
        for e, (enc_states, enc_mask) in enumerate(enc_data):
            normed = layer_norm(layer[f"ln_cross_{e}"], x)
            cross = multi_head_attention(
                layer[f"cross_att_{e}"], normed, enc_states,
                enc_states, self.n_heads_enc,
                key_mask=enc_mask)
            x = constrain_sequence(
                x + _maybe_dropout(cross, self.dropout_keep_prob,
                                   rngs["res_cross"][e]))
        normed = layer_norm(layer["ln_ff"], x)
        if self.moe_experts > 1:
            ff_out, aux = moe_ffn(
                layer["ff"], normed, mask=moe_mask,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                router_noise=self.moe_router_noise,
                noise_rng=rngs.get("moe_noise"),
                return_stats=moe_stats)
            return constrain_sequence(
                x + _maybe_dropout(ff_out, self.dropout_keep_prob,
                                   rngs["res_ff"])), aux
        ff_out = ffn(layer["ff"], normed)
        return constrain_sequence(
            x + _maybe_dropout(ff_out, self.dropout_keep_prob,
                               rngs["res_ff"]))

    def _train_layer_rngs(self, ctx: Context, i: int, n_enc: int):
        """Per-layer dropout rngs for the sequential path (fixed
        fold_in sites — the remat on/off invariant depends on this)."""
        res_drop = ctx.train and self.dropout_keep_prob < 1.0
        return {
            "self_att": (ctx.make_rng(self, f"self_att_drop_{i}")
                         if ctx.train
                         and self.attention_dropout_keep_prob < 1.0
                         else None),
            "res_self": (ctx.make_rng(self, f"res_self_{i}")
                         if res_drop else None),
            "res_cross": [
                (ctx.make_rng(self, f"res_cross_{i}_{e}")
                 if res_drop else None)
                for e in range(n_enc)],
            "res_ff": (ctx.make_rng(self, f"res_ff_{i}")
                       if res_drop else None),
            "moe_noise": (ctx.make_rng(self, f"moe_noise_{i}")
                          if ctx.train and self.moe_experts > 1
                          and self.moe_router_noise > 0.0 else None),
        }

    def _pipelined_train_layers(self, ctx: Context, params, x,
                                all_keys_mask, enc_data,
                                moe_mask=None):
        """Teacher-forced layer stack through the GPipe executor (see
        TransformerEncoder._pipelined_layers); encoder states and
        masks travel with each microbatch, MoE routing sums accumulate
        across microbatches inside the executor (exact full-batch
        balance/z — see gpipe_apply's aux_fn). Falls back to a
        sequential loop over the stacked layout when no pipeline mesh
        is registered or the batch does not divide."""
        from ...parallel.pipeline import gpipe_apply, pipeline_mesh
        mesh = pipeline_mesh()
        batch = x.shape[0]
        moe = self.moe_experts > 1
        n_micro = self.pipeline_microbatches or (
            mesh.shape["pipe"] if mesh is not None
            else self.pipeline_stages)
        dp = mesh.shape.get("data", 1) if mesh is not None else 1
        if mesh is None or batch % n_micro or (batch // n_micro) % dp:
            layer_fn = (jax.checkpoint(self._train_layer_fn)
                        if self.remat and ctx.train
                        else self._train_layer_fn)
            balance_total, z_total = 0.0, 0.0
            for i in range(self.depth):
                out = layer_fn(self._layer_params(params, i), x,
                               all_keys_mask, enc_data,
                               self._train_layer_rngs(ctx, i,
                                                      len(enc_data)),
                               moe_mask)
                if moe:
                    x, aux = out
                    balance_total = balance_total + aux["balance"]
                    z_total = z_total + aux["z"]
                else:
                    x = out
            self._add_moe_losses(ctx, balance_total, z_total)
            return x

        att_drop = (ctx.train
                    and self.attention_dropout_keep_prob < 1.0)
        res_drop = ctx.train and self.dropout_keep_prob < 1.0
        noise = (ctx.train and moe and self.moe_router_noise > 0.0)
        per_layer = None
        if att_drop or res_drop or noise:
            sites = (["self_att", "res_self", "res_ff"]
                     + [f"res_cross_{e}"
                        for e in range(len(enc_data))])
            if noise:
                sites.append("moe_noise")
            per_layer = {
                site: jnp.stack([
                    ctx.make_rng(self, f"pipe_{site}_{i}")
                    for i in range(self.depth)])
                for site in sites}
        mb_ord = jnp.repeat(jnp.arange(n_micro), batch // n_micro)

        def layer_fn(layer_p, layer_a, h, aux):
            if layer_a is None:
                rngs = {"self_att": None, "res_self": None,
                        "res_ff": None, "moe_noise": None,
                        "res_cross": [None] * len(enc_data)}
            else:
                mb = aux["mb"][0]

                def fold(site, gate):
                    return (jax.random.fold_in(layer_a[site], mb)
                            if gate else None)
                rngs = {
                    "self_att": fold("self_att", att_drop),
                    "res_self": fold("res_self", res_drop),
                    "res_ff": fold("res_ff", res_drop),
                    "moe_noise": fold("moe_noise", noise),
                    "res_cross": [fold(f"res_cross_{e}", res_drop)
                                  for e in range(len(enc_data))],
                }
            return self._train_layer_fn(layer_p, h, aux["mask"],
                                        aux["enc_data"], rngs,
                                        aux.get("moe_mask"),
                                        moe_stats=moe)

        if self.remat and ctx.train:
            layer_fn = jax.checkpoint(layer_fn)
        aux = {"mask": all_keys_mask, "enc_data": enc_data,
               "mb": mb_ord}
        if moe and moe_mask is not None:
            aux["moe_mask"] = moe_mask
        out = gpipe_apply(layer_fn, params["layers"], per_layer, x,
                          aux, n_microbatches=n_micro,
                          aux_fn=moe_combine_stats if moe else None)
        if moe:
            x, totals = out
            self._add_moe_losses(ctx, totals["balance"], totals["z"])
            return x
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
    def train_prelogit_states(self, ctx: Context):
        """(B, T, D) teacher-forced states AFTER the output layer norm
        — everything in :meth:`train_logits` but the vocab projection.
        Split out so the fused softmax-xent tail
        (ops/fused_xent.py) can consume the states without the
        (B·T, V) logits ever materializing."""
        params = ctx.get_params(self)
        inputs = self.train_inputs(ctx)
        x = self.embeddings.embed(ctx, inputs)
        time = x.shape[1]
        x = x + sinusoidal_position_encoding(
            time, self.model_dim, x.dtype)[None]
        x = ctx.dropout(self, x, self.dropout_keep_prob, "input_dropout")
        x = constrain_sequence(x)

        # masks stay f32 regardless of the activation policy (kernel
        # masking paths are f32; bf16 masks buy nothing)
        all_keys_mask = jnp.ones((x.shape[0], time), jnp.float32)
        enc_data = []
        for e, enc in enumerate(self.encoders):
            enc_data.append((enc.temporal_states(ctx),
                             enc.temporal_mask(ctx)))

        # padding tokens are excluded from MoE routing (capacity
        # slots and the balance loss track real tokens only)
        moe_mask = (self.train_mask(ctx)
                    if self.moe_experts > 1 else None)
        if self.pipeline_stages > 1:
            x = self._pipelined_train_layers(ctx, params, x,
                                             all_keys_mask, enc_data,
                                             moe_mask)
        else:
            layer_fn = (jax.checkpoint(self._train_layer_fn)
                        if self.remat and ctx.train
                        else self._train_layer_fn)
            balance_total, z_total = 0.0, 0.0
            for i in range(self.depth):
                out = layer_fn(params[f"layer_{i}"], x, all_keys_mask,
                               enc_data,
                               self._train_layer_rngs(ctx, i,
                                                      len(enc_data)),
                               moe_mask)
                if self.moe_experts > 1:
                    x, aux = out
                    balance_total = balance_total + aux["balance"]
                    z_total = z_total + aux["z"]
                else:
                    x = out
            self._add_moe_losses(ctx, balance_total, z_total)

        return layer_norm(params["ln_out"], x)

    @tensor
    def train_logits(self, ctx: Context):
        params = ctx.get_params(self)
        table = ctx.get_params(self.embeddings)["embeddings"]
        return self._logits_from_states(
            params, table, self.train_prelogit_states(ctx))

    def train_logit_projection(self, ctx: Context):
        """(w, b, transposed) of the output projection, in its NATIVE
        layout (tied: the (V, D) embedding table itself, no transpose
        materialization) — the fused-xent seam."""
        params = ctx.get_params(self)
        if self.tie_embeddings:
            table = ctx.get_params(self.embeddings)["embeddings"]
            return table, params["logit_bias"], True
        logit = params["logit"]
        b = logit.get("b")
        if b is None:
            b = jnp.zeros((logit["w"].shape[1],), jnp.float32)
        return logit["w"], b, False

    # ------------------------------------------------------------------ #
    # incremental decode contract (greedy + beam search)
    # ------------------------------------------------------------------ #
    @staticmethod
    def _cache_dtype():
        """Decode-time KV dtype: follows the compute policy.

        Measured round 4 (lineage decoding): f32 caches DECODE FASTER
        than bf16 caches under the f32 policy (316 vs 277 sent/s) even
        though bf16 halves the per-step attention-read bytes — the
        mixed-dtype lineage einsums (bf16 operands, f32 accumulation)
        lower worse than pure f32 at these shapes. bf16 caches only
        paid when the physical gather-reorder dominated (round 3:
        104 → 174). Keep the dtype tied to the policy; don't force
        bf16 caches independently."""
        from ...ops.policy import compute_dtype
        return compute_dtype() or jnp.float32

    def decode_constants(self, ctx: Context):
        params = ctx.get_params(self)
        cache_dtype = self._cache_dtype()
        constants: Dict[str, Any] = {
            "params": params,
            "embed_table":
                ctx.get_params(self.embeddings)["embeddings"],
            "enc_kv": [],
            "enc_bias": [],
        }
        # cross-attention K/V projected once per sentence
        for e, enc in enumerate(self.encoders):
            enc_states = enc.temporal_states(ctx)
            per_layer = []
            for i in range(self.depth):
                att_p = self._layer_params(params, i)[f"cross_att_{e}"]
                per_layer.append(
                    (nn.linear(att_p["k"], enc_states
                               ).astype(cache_dtype),
                     nn.linear(att_p["v"], enc_states
                               ).astype(cache_dtype)))
            constants["enc_kv"].append(per_layer)
            constants["enc_bias"].append(
                attention_bias_from_mask(enc.temporal_mask(ctx)))
        if self.moe_experts > 1:
            # (B,) validity of each batch row: batch-padding rows (all-
            # zero source mask) must not claim MoE capacity slots —
            # otherwise a real sentence's decode output would depend on
            # how many pad rows its batch happens to carry (the
            # padding-inertness invariant, utils/batching.py)
            if self.encoders:
                constants["row_valid"] = jnp.max(
                    self.encoders[0].temporal_mask(ctx), axis=1
                ).astype(jnp.float32)
            else:  # LM decode: row validity is unknowable here
                constants["row_valid"] = jnp.ones(
                    (self._batch_size(ctx),), jnp.float32)
        return constants

    def tile_decode_constants(self, constants, k: int):
        tiled = dict(constants)
        rep = lambda x: jnp.repeat(x, k, axis=0)
        tiled["enc_kv"] = jax.tree_util.tree_map(
            rep, constants["enc_kv"])
        tiled["enc_bias"] = jax.tree_util.tree_map(
            rep, constants["enc_bias"])
        if "row_valid" in constants:
            tiled["row_valid"] = rep(constants["row_valid"])
        return tiled

    def tile_decode_constants_lineage(self, constants, k: int):
        """Cross-attention K/V and masks are beam-invariant: keep ONE
        copy per sentence. The tiled layout re-reads K identical
        copies every step (~750 MB/step at the bench shape) — the
        lineage step shares them across the beam instead."""
        return dict(constants)

    def decode_initial_state(self, ctx: Context, constants):
        batch = self._batch_size(ctx)
        cache_dtype = self._cache_dtype()
        caches = []
        for _ in range(self.depth):
            caches.append({
                "k": jnp.zeros((batch, self.max_output_len,
                                self.model_dim), cache_dtype),
                "v": jnp.zeros((batch, self.max_output_len,
                                self.model_dim), cache_dtype),
            })
        return tuple(caches)

    def tile_decode_state(self, state, beam: int, lineage: bool):
        """Beam-tile the decode loop state. The plain path row-repeats
        (the generic ``_tile_beam``); when lineage decoding can use the
        fused Pallas kernel (ops/lineage_attention.py), the KV caches
        are rebuilt in the kernel's time-major-interleaved layout
        instead: k (B, H, Dh, K·T) with lane index t·K + j, v
        (B, H, K·T, Dh) — a static decode window is then a contiguous
        lane prefix, and per-step writes are K contiguous lanes."""
        import os
        from ...ops.kernel_config import use_pallas
        from ...ops.lineage_attention import lineage_kernel_ok
        heads = self.n_heads_self
        head_dim = self.model_dim // heads
        # Measured on-chip (docs/performance.md, round 4): the fused
        # kernel path LOSES to the einsum path at bench shapes (the
        # K16-row dots are MXU-granularity-bound), so it is opt-in.
        if not (lineage and use_pallas()
                and os.environ.get("NM_LINEAGE_KERNEL") == "1"
                and lineage_kernel_ok(beam, heads, head_dim,
                                      self.max_output_len)):
            return jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, beam, axis=0), state)
        batch = state[0]["k"].shape[0]
        dtype = state[0]["k"].dtype
        if os.environ.get("NM_LINEAGE_KERNEL_BF16") == "1":
            dtype = jnp.bfloat16
        lanes = beam * self.max_output_len
        caches = []
        for _ in range(self.depth):
            caches.append({
                "kq": jnp.zeros((batch, heads, head_dim, lanes),
                                dtype),
                "vq": jnp.zeros((batch, heads, lanes, head_dim),
                                dtype),
            })
        return tuple(caches)

    def decode_step(self, constants: Any, loop_state: Any,
                    prev_ids: jnp.ndarray, step: Any):
        params = constants["params"]
        table = constants["embed_table"]
        caches = loop_state

        x = jnp.take(table, prev_ids, axis=0)
        x = x * jnp.sqrt(jnp.asarray(self.model_dim, x.dtype))
        x = x + sinusoidal_position_encoding(
            self.max_output_len, self.model_dim, x.dtype)[step]
        x = x[:, None, :]  # (B, 1, D)

        # positions beyond `step` are masked out of the cache attention
        positions = jnp.arange(self.max_output_len)
        cache_bias = jnp.where(positions <= step, 0.0,
                               NEG_INF)[None, None, None, :]

        att_weights = None
        new_caches = []
        for i in range(self.depth):
            layer = self._layer_params(params, i)
            cache = caches[i]
            normed = layer_norm(layer["ln_self"], x)
            att_p = layer["self_att"]
            q = nn.linear(att_p["q"], normed)
            k_t = nn.linear(att_p["k"], normed)
            v_t = nn.linear(att_p["v"], normed)
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k_t.astype(cache["k"].dtype), step, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v_t.astype(cache["v"].dtype), step, axis=1)
            new_caches.append({"k": k_cache, "v": v_cache})
            att = dot_product_attention(
                split_heads(q, self.n_heads_self),
                split_heads(k_cache, self.n_heads_self),
                split_heads(v_cache, self.n_heads_self),
                cache_bias)
            att = nn.linear(att_p["o"], merge_heads(att))
            x = x + att
            for e in range(len(self.encoders)):
                normed = layer_norm(layer[f"ln_cross_{e}"], x)
                att_p = layer[f"cross_att_{e}"]
                q = nn.linear(att_p["q"], normed)
                k_enc, v_enc = constants["enc_kv"][e][i]
                qh = split_heads(q, self.n_heads_enc)
                cross = dot_product_attention(
                    qh,
                    split_heads(k_enc, self.n_heads_enc),
                    split_heads(v_enc, self.n_heads_enc),
                    constants["enc_bias"][e])
                if i == self.depth - 1 and e == 0:
                    # last layer's first-encoder cross-attention,
                    # head-averaged — the attention-map feature
                    # (DCE'd when the caller ignores aux). The score
                    # matmul duplicates the one inside
                    # dot_product_attention; XLA CSEs it.
                    scale = 1.0 / (qh.shape[-1] ** 0.5)
                    s = jnp.einsum(
                        "bhqd,bhkd->bhqk",
                        qh.astype(k_enc.dtype),
                        split_heads(k_enc, self.n_heads_enc),
                        preferred_element_type=jnp.float32) * scale
                    w = jax.nn.softmax(
                        s + constants["enc_bias"][e], axis=-1)
                    att_weights = jnp.mean(w[:, :, 0, :], axis=1)
                x = x + nn.linear(att_p["o"], merge_heads(cross))
            normed = layer_norm(layer["ln_ff"], x)
            x = x + self._decode_ffn(layer, normed,
                                     constants.get("row_valid"))

        x = layer_norm(params["ln_out"], x)[:, 0, :]  # (B, D)
        logits, sel_aux = self._step_logits(
            constants, x,
            lambda: self._logits_from_states(params, table, x))
        aux = ({"attention_weights": (att_weights,), **sel_aux}
               if att_weights is not None else sel_aux)
        return tuple(new_caches), logits, aux

    # ------------------------------------------------------------------ #
    # lineage decoding: beam search without physical cache reorder
    # ------------------------------------------------------------------ #
    lineage_decode = True
    emits_attention = True

    def decode_step_lineage(self, constants: Any, loop_state: Any,
                            prev_ids: jnp.ndarray, step: Any,
                            anc: jnp.ndarray, beam: int,
                            window: int = None):
        """Beam-search step with ancestry-resolved self-attention.

        The physical beam reorder gathers + rewrites every layer's KV
        cache each step — measured as THE dominant cost of transformer
        beam decode (TPU gather ≈ 2.7× a copy; ~750 MB/step at the
        bench shape). Here caches stay unpermuted (each row owned by
        the beam slot that wrote it) and lineage is resolved in score
        space: self-attention scores are computed against *all* K beam
        slots (a factor-K more score FLOPs — a few GFLOP/step, noise
        next to the saved HBM traffic) and reduced through the one-hot
        ancestry mask ``anc[b, k, t]``. Per (k, t) exactly one slot
        matches, and masked products are exact float zeros, so the
        result equals the physically-reordered attention bit-for-bit
        up to reduction order.
        """
        params = constants["params"]
        table = constants["embed_table"]
        caches = loop_state
        rows = prev_ids.shape[0]
        batch = rows // beam
        length = self.max_output_len
        # static read window: positions >= window are known-invalid,
        # so attention reads only the cache prefix (the search grows
        # the window across segmented loops)
        win = length if window is None else min(window, length)

        x = jnp.take(table, prev_ids, axis=0)
        x = x * jnp.sqrt(jnp.asarray(self.model_dim, x.dtype))
        x = x + sinusoidal_position_encoding(
            length, self.model_dim, x.dtype)[step]
        x = x[:, None, :]  # (B*K, 1, D)

        row_valid = constants.get("row_valid")
        if row_valid is not None:  # untiled (B,) -> beam-major (B*K,)
            row_valid = jnp.repeat(row_valid, beam, axis=0)

        att_weights = None

        heads = self.n_heads_self
        head_dim = self.model_dim // heads
        scale = 1.0 / (head_dim ** 0.5)

        kernel_layout = isinstance(caches[0], dict) \
            and "kq" in caches[0]
        if kernel_layout:
            from ...ops.lineage_attention import (lane_window,
                                                  lineage_bias)
            total_lanes = beam * length
            win_lanes = lane_window(win, beam, total_lanes)
            # one bias per step, shared by every layer and head
            lin_bias = lineage_bias(anc, step, win, beam, win_lanes,
                                    length)
        else:
            positions = jnp.arange(win)
            # (1, 1, 1, W): positions beyond `step` masked everywhere
            cache_bias = jnp.where(positions <= step, 0.0,
                                   NEG_INF)[None, None, None, :]
            # one-hot lineage mask (B, K, J, W), shared by all layers;
            # future positions hold the identity slot (the search
            # resets them after every selection), so they are exact
            lineage = (anc[:, :, None, :win]
                       == jnp.arange(beam, dtype=anc.dtype)[
                           None, None, :, None]).astype(jnp.float32)

        new_caches = []
        for i in range(self.depth):
            layer = self._layer_params(params, i)
            cache = caches[i]
            normed = layer_norm(layer["ln_self"], x)
            att_p = layer["self_att"]
            q = nn.linear(att_p["q"], normed)
            k_t = nn.linear(att_p["k"], normed)
            v_t = nn.linear(att_p["v"], normed)
            if kernel_layout:
                # fused Pallas lineage attention: scores vs all slots
                # + one-hot -inf bias + flat softmax + context in one
                # kernel (2 MXU dots per head; ops/lineage_attention)
                from ...ops.lineage_attention import lineage_attention
                k_ins = k_t.reshape(batch, beam, heads, head_dim) \
                    .transpose(0, 2, 3, 1).astype(cache["kq"].dtype)
                v_ins = v_t.reshape(batch, beam, heads, head_dim) \
                    .transpose(0, 2, 1, 3).astype(cache["vq"].dtype)
                kq = jax.lax.dynamic_update_slice(
                    cache["kq"], k_ins,
                    (0, 0, 0, step * beam))
                vq = jax.lax.dynamic_update_slice(
                    cache["vq"], v_ins,
                    (0, 0, step * beam, 0))
                new_caches.append({"kq": kq, "vq": vq})
                k16 = lin_bias.shape[1]
                q4 = q.reshape(batch, beam, heads, head_dim) \
                    .transpose(0, 2, 1, 3)
                if k16 > beam:
                    q4 = jnp.pad(
                        q4, ((0, 0), (0, 0), (0, k16 - beam), (0, 0)))
                ctx4 = lineage_attention(q4, kq, vq, lin_bias,
                                         win_lanes)
                att = ctx4[:, :, :beam].transpose(0, 2, 1, 3) \
                    .reshape(rows, 1, self.model_dim).astype(x.dtype)
                x = x + nn.linear(att_p["o"], att)
                x, att_weights = self._lineage_cross_ffn(
                    layer, x, constants, batch, beam, rows, i,
                    att_weights, row_valid)
                continue
            # each beam writes its OWN row — never reordered
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k_t.astype(cache["k"].dtype), step, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v_t.astype(cache["v"].dtype), step, axis=1)
            new_caches.append({"k": k_cache, "v": v_cache})

            qh = q.reshape(batch, beam, heads, head_dim)
            kh = k_cache[:, :win].reshape(
                batch, beam, win, heads, head_dim)
            vh = v_cache[:, :win].reshape(
                batch, beam, win, heads, head_dim)
            # scores vs every slot j, then lineage-reduce over j
            s_full = jnp.einsum(
                "bkhd,bjthd->bhkjt", qh.astype(kh.dtype), kh,
                preferred_element_type=jnp.float32) * scale
            s = jnp.einsum("bhkjt,bkjt->bhkt", s_full, lineage)
            weights = jax.nn.softmax(s + cache_bias, axis=-1)
            w_slot = jnp.einsum("bhkt,bkjt->bhkjt", weights,
                                lineage).astype(vh.dtype)
            ctx_v = jnp.einsum(
                "bhkjt,bjthd->bkhd", w_slot, vh,
                preferred_element_type=jnp.float32)
            att = ctx_v.reshape(rows, 1, self.model_dim)
            x = x + nn.linear(att_p["o"], att)

            heads_e = self.n_heads_enc
            x, att_weights = self._lineage_cross_ffn(
                layer, x, constants, batch, beam, rows, i,
                att_weights, row_valid)

        x = layer_norm(params["ln_out"], x)[:, 0, :]
        logits, sel_aux = self._step_logits(
            constants, x,
            lambda: self._logits_from_states(params, table, x))
        aux = ({"attention_weights": (att_weights,), **sel_aux}
               if att_weights is not None else sel_aux)
        return tuple(new_caches), logits, aux

    def _lineage_cross_ffn(self, layer, x, constants, batch: int,
                           beam: int, rows: int, i: int, att_weights,
                           row_valid):
        """One lineage-decode layer's cross-attention(s) + FFN tail —
        shared by the einsum and fused-kernel self-attention paths."""
        heads_e = self.n_heads_enc
        dh_e = self.model_dim // heads_e
        for e in range(len(self.encoders)):
            normed = layer_norm(layer[f"ln_cross_{e}"], x)
            att_p = layer[f"cross_att_{e}"]
            q = nn.linear(att_p["q"], normed)
            # enc K/V kept UNtiled (one copy per sentence, see
            # tile_decode_constants_lineage) — all K beams attend
            # to the same keys, so fold the beam into the query
            k_enc, v_enc = constants["enc_kv"][e][i]
            src_len = k_enc.shape[1]
            qe = q.reshape(batch, beam, heads_e, dh_e)
            ke = k_enc.reshape(batch, src_len, heads_e, dh_e)
            ve = v_enc.reshape(batch, src_len, heads_e, dh_e)
            scale_e = 1.0 / (dh_e ** 0.5)
            s_e = jnp.einsum(
                "bkhd,bthd->bhkt", qe.astype(ke.dtype), ke,
                preferred_element_type=jnp.float32) * scale_e
            # enc_bias is (B, 1, 1, T): broadcasts over heads/beams
            w_e = jax.nn.softmax(
                s_e + constants["enc_bias"][e], axis=-1)
            if i == self.depth - 1 and e == 0:
                # attention-map feature (see decode_step); (rows,
                # T_src) head-averaged, DCE'd when aux is unused
                att_weights = jnp.mean(w_e, axis=1).reshape(
                    rows, src_len)
            cross = jnp.einsum(
                "bhkt,bthd->bkhd", w_e.astype(ve.dtype), ve,
                preferred_element_type=jnp.float32)
            cross = cross.reshape(rows, 1, self.model_dim)
            x = x + nn.linear(att_p["o"], cross)
        normed = layer_norm(layer["ln_ff"], x)
        x = x + self._decode_ffn(layer, normed, row_valid)
        return x, att_weights
