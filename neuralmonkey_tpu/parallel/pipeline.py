"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference framework (nm/tf_manager.py and the encoder stacks under
nm/encoders/) is single-device; pipeline parallelism is a TPU-native
scaling extension in the spirit of SURVEY.md §6's mesh design. The
transformer layer stacks are homogeneous, so a depth-L stack can be
cut into S stages of L/S layers each, with each stage's layer
parameters resident on one 'pipe' mesh group only (1/S of the layer
weights per device — the memory axis TP/SP cannot give you).

Execution is the classic GPipe schedule expressed with
``jax.shard_map``: the batch is cut into M microbatches; at clock tick
``t`` stage ``s`` runs microbatch ``t - s`` through its local layers
and hands the activation to stage ``s+1`` via ``lax.ppermute``. The
pipeline fills/drains for S-1 ticks (the bubble: (S-1)/(M+S-1) idle
fraction, amortized by larger M). Autodiff through the schedule yields
the reverse pipeline for the backward pass — ppermute transposes to
the opposite ring — so training needs no hand-written backward.

Stages compute garbage activations during fill/drain ticks (their
input buffer holds zeros or another microbatch's tail); the garbage
never reaches the output: only the last stage's in-range ticks are
written, and the cross-stage psum that replicates the result masks
everything else with exact zeros. Equivalence with the sequential
layer stack is therefore exact up to XLA fusion noise (tested in
tests/test_pipeline.py).

Activation memory and why there is no '1F1B schedule' knob: under JAX
autodiff the train step is one XLA program whose full forward runs
before any backward, so peak liveness is set by what the forward SAVES
for the backward — not by microbatch ordering. Reordering the same
saved residuals 1F1B-style cannot reduce the peak; what changes the
saved set is ``remat=True`` on the pipelined part (layer bodies are
``jax.checkpoint``-ed, leaving only per-tick stage inputs live —
measured 0.43x per-device activation temps via compiled
``memory_analysis()``, tests/test_pipeline.py). A true 1F1B — in-flight
microbatches bounded by S rather than M — requires the loss itself to
ride inside the per-microbatch schedule (hand-scheduled per-microbatch
VJPs in one scan), which would close the train step around one
objective and break the any-trainer-over-any-decoder contract; with
remat the remaining O(M) term is just the stage inputs. The supported
memory recipe is pipeline_stages + remat (+ shard_optimizer_state for
the moments); see docs/distributed.md.

Like sequence parallelism (ops/sharding.py) this is a registry the
runtime fills in: ``TPUManager(num_pipeline_stages=S)`` builds a
('data', 'pipe') mesh and registers it here; transformer parts built
with ``pipeline_stages=S`` stack their layer params along a leading
axis declared ('pipe', ...) and route their layer loop through
:func:`gpipe_apply`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

_PIPE_MESH = None


def enable_pipeline(mesh: object) -> None:
    """Register the mesh whose 'pipe' axis pipeline-parallel parts
    should stage over (done by TPUManager when constructed with
    ``num_pipeline_stages > 1``)."""
    global _PIPE_MESH
    _PIPE_MESH = mesh


def disable_pipeline() -> None:
    global _PIPE_MESH
    _PIPE_MESH = None


def pipeline_mesh() -> Optional[Any]:
    return _PIPE_MESH


def gpipe_apply(layer_fn: Callable,
                stacked_params: Any,
                per_layer_aux: Any,
                x,
                mb_aux: Any,
                n_microbatches: int = None,
                aux_fn: Callable = None):
    """Run a homogeneous layer stack as a GPipe pipeline.

    Args:
      layer_fn: ``(layer_params, layer_aux, x_mb, aux_mb) -> x_mb``;
        one layer on one microbatch. Must be collective-free (pure
        per-example compute). With ``aux_fn``, returns
        ``(x_mb, stats)`` instead, where ``stats`` is a pytree of
        per-layer sums LINEAR in the microbatch's tokens (e.g. MoE
        routing statistics).
      stacked_params: layer params stacked on a leading axis of size
        L (total layers); sharded over 'pipe' (L % S == 0).
      per_layer_aux: pytree stacked like ``stacked_params`` (e.g.
        per-layer dropout keys), or None.
      x: (B, T, D) residual-stream input.
      mb_aux: pytree of per-example arrays (leading axis B) that each
        microbatch carries alongside x (masks, encoder states, ...).
        Replicated over 'pipe'; split over microbatches with x.
      n_microbatches: M; defaults to the stage count S.
      aux_fn: ``(stats) -> pytree of scalars``, folding ONE layer's
        microbatch-accumulated stats into its loss terms (e.g.
        ``moe_combine_stats``). Stats from fill/drain garbage ticks
        are masked to zero before accumulation, so each layer folds
        exactly its full-batch sums — the returned scalars equal the
        sequential stack's per-layer values. Requires partial-auto
        ``jax.shard_map`` (the stats ride GSPMD-global values).

    Returns (B, T, D), equal to running the layers sequentially —
    or ``((B, T, D), aux)`` with ``aux_fn``, where ``aux`` is the
    per-layer ``aux_fn`` outputs SUMMED over all L layers.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = _PIPE_MESH
    if mesh is None:
        raise RuntimeError(
            "gpipe_apply called without a registered pipeline mesh "
            "(TPUManager(num_pipeline_stages=...) registers one)")
    n_stages = mesh.shape["pipe"]
    n_micro = n_microbatches or n_stages
    batch = x.shape[0]
    if batch % n_micro:
        raise ValueError(
            f"batch {batch} not divisible by {n_micro} microbatches")
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers not divisible by {n_stages} stages")
    dp = mesh.shape.get("data", 1)
    if (batch // n_micro) % dp:
        raise ValueError(
            f"microbatch size {batch // n_micro} not divisible by "
            f"data-parallel degree {dp}")

    def to_mb(a):
        return a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:])

    x_mb = to_mb(x)
    mb_aux_mb = jax.tree_util.tree_map(to_mb, mb_aux)

    # microbatches stay batch-sharded over 'data' (axis 1 after the
    # reshape); layer stacks shard over 'pipe'; everything else rides
    # replicated into the manual region
    mb_spec = P(None, "data")
    stack_spec = P("pipe")

    def per_device(stacked_local, aux_local, x_local, mb_aux_local):
        stage = jax.lax.axis_index("pipe")

        def run_stage(h, aux_mb):
            def body(carry, layer):
                layer_p, layer_a = layer
                out = layer_fn(layer_p, layer_a, carry, aux_mb)
                if aux_fn is not None:
                    return out  # (h, stats)
                return out, None
            out, stats = jax.lax.scan(body, h,
                                      (stacked_local, aux_local))
            return out, stats  # stats: (L_local, ...) pytree or None

        carry = jnp.zeros_like(x_local[0])
        outs = jnp.zeros_like(x_local)
        stats_acc = None
        for t in range(n_micro + n_stages - 1):
            # stage s processes microbatch t - s at tick t; out-of-range
            # ticks compute garbage that is masked out below
            h_in = jnp.where(stage == 0, x_local[min(t, n_micro - 1)],
                             carry)
            mb_here = jnp.clip(t - stage, 0, n_micro - 1)
            aux_here = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mb_here, axis=0, keepdims=False),
                mb_aux_local)
            h, stats = run_stage(h_in, aux_here)
            if aux_fn is not None:
                # fill/drain ticks re-run a clipped microbatch; their
                # stats must not count twice (the outputs are masked
                # downstream anyway, the sums would not be)
                # select, don't multiply: a garbage tick can produce
                # inf/NaN stats leaves, and 0*inf = NaN would poison
                # the accumulated sums
                valid = (t - stage >= 0) & (t - stage < n_micro)
                masked = jax.tree_util.tree_map(
                    lambda s: jnp.where(valid, s, jnp.zeros_like(s)),
                    stats)
                stats_acc = (masked if stats_acc is None
                             else jax.tree_util.tree_map(
                                 jnp.add, stats_acc, masked))
            if t >= n_stages - 1:
                out_idx = t - (n_stages - 1)
                outs = jnp.where(
                    stage == n_stages - 1,
                    jax.lax.dynamic_update_index_in_dim(
                        outs, h, out_idx, axis=0),
                    outs)
            if t < n_micro + n_stages - 2:
                carry = jax.lax.ppermute(
                    h, "pipe",
                    [(i, (i + 1) % n_stages)
                     for i in range(n_stages)])
        # replicate the last stage's outputs across the pipe axis;
        # other stages contribute exact zeros
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs,
                      jnp.zeros_like(outs)), "pipe")
        if aux_fn is None:
            return out
        # fold each local layer's full-batch sums into its loss terms,
        # sum over this stage's layers, then over stages: each layer
        # lives on exactly one stage, so the psum totals all L layers
        per_layer_vals = jax.vmap(aux_fn)(stats_acc)
        local = jax.tree_util.tree_map(
            lambda a: jnp.sum(a, axis=0), per_layer_vals)
        total = jax.lax.psum(local, "pipe")
        return out, total

    stack_specs = jax.tree_util.tree_map(lambda _: stack_spec,
                                         stacked_params)
    aux_specs = jax.tree_util.tree_map(lambda _: stack_spec,
                                       per_layer_aux)
    # replication checking off: the masked psum that replicates the
    # last stage's outputs across 'pipe' is exact but opaque to the
    # static replication checker
    sm = getattr(jax, "shard_map", None)
    if sm is not None:
        # partial-auto: ONLY 'pipe' is manual. Batch sharding over
        # 'data' and any Megatron 'model'-axis sharding of the layer
        # weights' trailing dims stay GSPMD-managed inside the stage
        # body, so the pipeline composes with DP and TP transparently
        # (XLA inserts the TP psums per tick from the param shardings
        # alone).
        plain = P()
        out_sp = plain if aux_fn is None else (plain, plain)
        wrapped = sm(
            per_device, mesh=mesh,
            in_specs=(stack_specs, aux_specs, plain,
                      jax.tree_util.tree_map(lambda _: plain,
                                             mb_aux_mb)),
            out_specs=out_sp, axis_names={"pipe"}, check_vma=False)
    else:
        # older jax: fully-manual fallback. No TP composition, and
        # dropout inside the body samples per-device shapes with an
        # unfolded key — masks repeat across data shards (the
        # partial-auto path above samples the global shape instead).
        if aux_fn is not None:
            raise RuntimeError(
                "gpipe_apply(aux_fn=...) needs partial-auto "
                "jax.shard_map (jax >= 0.4.32): the per-layer stats "
                "are sums over the GSPMD-global batch")
        from jax.experimental.shard_map import shard_map
        mb_aux_specs = jax.tree_util.tree_map(lambda _: mb_spec,
                                              mb_aux_mb)
        wrapped = shard_map(
            per_device, mesh=mesh,
            in_specs=(stack_specs, aux_specs, mb_spec, mb_aux_specs),
            out_specs=mb_spec, check_rep=False)
    res = wrapped(stacked_params, per_layer_aux, x_mb, mb_aux_mb)
    out, aux_total = res if aux_fn is not None else (res, None)
    out = out.reshape((batch,) + out.shape[2:])
    if aux_fn is not None:
        return out, aux_total
    return out
