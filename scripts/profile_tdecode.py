"""Per-op anatomy of the transformer beam-10 decode step (VERDICT r3
item 1): scan-timed in-jit per CLAUDE.md protocol — loop each
component on device inside ONE jit (lax.scan threading real data
dependencies), sync once with a host transfer, divide.

Usage (real TPU):  python scripts/profile_tdecode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from neuralmonkey_tpu.model.part import Context

REPS = int(os.environ.get("PROF_REPS", "30"))


def timed(name, fn, *args):
    """Compile, warm, run the scan-looped jit, sync once."""
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    start = time.perf_counter()
    out = fn(*args)
    # sync via host transfer of one leaf
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf)
    elapsed = time.perf_counter() - start
    per = elapsed / REPS * 1000
    print(f"{name:44s} {per:8.3f} ms/iter")
    return per


def main():
    enc, dec, bs, params, batch, _ = bench.build_transformer(
        bench.BATCH)
    ctx = Context(params, batch, train=False)
    constants = dec.decode_constants(ctx)
    init_state = dec.decode_initial_state(ctx, constants)
    beam = bench.BEAM
    batch_n = bench.BATCH
    rows = batch_n * beam
    length = bench.MAX_OUT

    # selector fusion + lane alignment, as the real search arms them
    constants = bs.parent_decoder.align_logits_for_selection(constants)
    constants = bs.parent_decoder.prepare_selection_fusion(constants)
    tiled = dec.tile_decode_constants_lineage(constants, beam)
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        _tile_beam
    states = _tile_beam(init_state, beam)

    anc0 = jnp.broadcast_to(
        jnp.arange(beam, dtype=jnp.int32)[None, :, None],
        (batch_n, beam, length))
    prev0 = jnp.ones((rows,), jnp.int32)

    # ---------------- full search baseline ---------------- #
    @jax.jit
    def full_search(p, b):
        c = Context(p, b, train=False)
        return bs.search(c).token_ids

    t0 = time.perf_counter()
    ids = full_search(params, batch)
    _ = np.asarray(ids)
    print(f"full search compile+run: {time.perf_counter()-t0:.1f}s")
    start = time.perf_counter()
    N_RUNS = 5
    for _ in range(N_RUNS):
        ids = full_search(params, batch)
    _ = np.asarray(ids)
    search_s = (time.perf_counter() - start) / N_RUNS
    print(f"{'FULL SEARCH (48 steps)':44s} {search_s*1000:8.3f} ms"
          f"  -> {batch_n/search_s:.1f} sent/s (no host pipeline)")
    per_step_budget = search_s / length * 1000
    print(f"{'  implied per-step':44s} {per_step_budget:8.3f} ms")

    # ---------------- full decode step, scanned ---------------- #
    def make_step_scan(window):
        @jax.jit
        def run(states, tiled, anc, prev):
            def body(carry, step):
                st, pv = carry
                new_st, logits, aux = dec.decode_step_lineage(
                    tiled, st, pv, step % length, anc, beam,
                    window=window)
                pv = jnp.argmin(logits, axis=-1).astype(jnp.int32)
                return (new_st, pv), ()
            (st, pv), _ = jax.lax.scan(
                body, (states, prev), jnp.arange(REPS))
            return pv
        return run

    for window in (12, 24, 48):
        timed(f"decode_step_lineage w={window}",
              make_step_scan(window), states, tiled, anc0, prev0)

    # ---------------- logits epilogue alone ---------------- #
    x0 = jnp.asarray(np.random.randn(rows, bench.T_DIM),
                     np.float32)

    @jax.jit
    def logits_scan(x, tiled):
        def body(x, _):
            logits, sel = dec._step_logits(
                tiled, x,
                lambda: dec._logits_from_states(
                    tiled["params"], tiled["embed_table"], x))
            # thread a dependency back into x
            dep = (sel["sel_lse"] if isinstance(sel, dict)
                   and "sel_lse" in sel else logits[..., 0])
            return x + 1e-20 * dep.reshape(rows, -1)[:, :1], ()
        x, _ = jax.lax.scan(body, x, jnp.arange(REPS))
        return x

    timed("logits projection (+fused selector)", logits_scan, x0,
          tiled)

    # ---------------- layers-only (logits stubbed) --------------- #
    real_step_logits = dec.__class__._step_logits

    def cheap_logits(self, constants, x, fallback):
        return x[:, :128], {}
    dec.__class__._step_logits = cheap_logits
    try:
        for window in (24, 48):
            timed(f"layers only (no logits) w={window}",
                  make_step_scan(window), states, tiled, anc0, prev0)
    finally:
        dec.__class__._step_logits = real_step_logits

    # ---------------- selection alone ---------------- #
    from neuralmonkey_tpu.models.decoders.beam_search_decoder import \
        SearchState, NEG_INF, PAD_TOKEN_INDEX
    vocab_real = len(dec.vocabulary)
    search0 = SearchState(
        logprob_sum=jnp.tile(
            jnp.concatenate([jnp.zeros((1,)),
                             jnp.full((beam - 1,), NEG_INF)])[None, :],
            (batch_n, 1)),
        lengths=jnp.zeros((batch_n, beam), jnp.int32),
        finished=jnp.zeros((batch_n, beam), bool),
        token_ids=jnp.full((batch_n, beam, length), PAD_TOKEN_INDEX,
                           jnp.int32))

    # raw logits at the aligned width
    vp = tiled["params"]["logit_w"].shape[-1] if "logit_w" in \
        tiled["params"] else 30720
    logits0 = jnp.asarray(
        np.random.randn(rows, vp).astype(np.float32))

    @jax.jit
    def select_scan(logits, search):
        def body(carry, _):
            logits, search = carry
            parents, tokens, new_logprob, top = bs._select_hier(
                logits, False, search, batch_n, precomputed=None)
            search = SearchState(
                logprob_sum=new_logprob, lengths=search.lengths,
                finished=search.finished, token_ids=search.token_ids)
            return (logits + 1e-20 * new_logprob[0, 0], search), ()
        (logits, search), _ = jax.lax.scan(
            body, (logits, search), jnp.arange(REPS))
        return search.logprob_sum

    timed("hierarchical selection (unfused reductions)", select_scan,
          logits0, search0)

    # ---------------- ancestry/bookkeeping tail ---------------- #
    @jax.jit
    def book_scan(anc, search):
        def body(carry, step):
            anc, search = carry
            parents = jnp.tile(
                jnp.arange(beam, dtype=jnp.int32)[None, :],
                (batch_n, 1))
            inherited = jnp.take_along_axis(anc, parents[..., None],
                                            axis=1)
            pos = jnp.arange(length)[None, None, :]
            anc = jnp.where(pos <= step, inherited, anc0)
            old_tokens = jnp.take_along_axis(
                search.token_ids, parents[..., None], axis=1)
            emit = jnp.take_along_axis(
                search.lengths, parents, axis=1)
            new_tokens = jax.lax.dynamic_update_slice_in_dim(
                old_tokens, emit[..., None], step % length, axis=2)
            search = SearchState(
                logprob_sum=search.logprob_sum,
                lengths=search.lengths, finished=search.finished,
                token_ids=new_tokens)
            return (anc, search), ()
        (anc, search), _ = jax.lax.scan(
            body, (anc, search), jnp.arange(REPS))
        return search.token_ids

    timed("ancestry + token bookkeeping", book_scan, anc0, search0)


if __name__ == "__main__":
    main()
