"""Per-op anatomy of the transformer train step (VERDICT r3 item 5):
where do the non-matmul milliseconds go? Scan-timed in-jit per the
CLAUDE.md protocol. Run on the real TPU:

    python scripts/profile_ttrain.py [rnn]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench

REPS = int(os.environ.get("PROF_REPS", "20"))


def timed(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    start = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    elapsed = time.perf_counter() - start
    per = elapsed / REPS * 1000
    print(f"{name:46s} {per:8.3f} ms/iter")
    return per


def main(model="transformer"):
    import optax
    from neuralmonkey_tpu.trainers.cross_entropy_trainer import \
        CrossEntropyTrainer
    from neuralmonkey_tpu.trainers.optimizers import AdamOptimizer
    from neuralmonkey_tpu.model.part import Context

    if model == "transformer":
        enc, dec, _, params, batch, _ = bench.build_transformer(
            bench.BATCH)
    else:
        enc, dec, _, params, batch, _ = bench.build(bench.BATCH)
    rng = np.random.RandomState(1)
    tgt = rng.randint(4, bench.VOCAB,
                      size=(bench.BATCH, bench.MAX_OUT)).astype(
                          np.int32)
    batch = dict(batch)
    batch[dec.input_ids_key] = jnp.asarray(tgt)
    batch[dec.target_ids_key] = jnp.asarray(tgt)
    batch[dec.target_mask_key] = jnp.ones(
        (bench.BATCH, bench.MAX_OUT), jnp.float32)

    trainer = CrossEntropyTrainer(
        decoders=[dec], clip_norm=1.0,
        optimizer=AdamOptimizer(learning_rate=1e-4))
    tx = trainer.make_optax()
    key = jax.random.PRNGKey(0)

    # ---------- full step (fwd+bwd+clip+adam), scanned ---------- #
    @jax.jit
    def full_scan(params, opt_state, batch):
        def body(carry, _):
            p, o = carry
            def loss_fn(p_):
                return trainer.total_loss(p_, batch, key)
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), total
        (params, opt_state), totals = jax.lax.scan(
            body, (params, opt_state), jnp.arange(REPS))
        return totals[-1]

    opt_state = tx.init(params)
    t_full = timed("full train step", full_scan, params, opt_state,
                   batch)

    # ---------- fwd+bwd only ---------- #
    # thread grads into params so iterations are dependent
    @jax.jit
    def grad_scan2(params, batch):
        def body(p, _):
            def loss_fn(p_):
                return trainer.total_loss(p_, batch, key)
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            p = jax.tree_util.tree_map(
                lambda a, g: a + 1e-30 * g, p, grads)
            return p, total
        p, totals = jax.lax.scan(body, params, jnp.arange(REPS))
        return totals[-1]

    t_grad = timed("fwd+bwd (value_and_grad only)", grad_scan2,
                   params, batch)

    # ---------- forward only ---------- #
    @jax.jit
    def fwd_scan(params, batch):
        def body(p, _):
            total, _ = trainer.total_loss(p, batch, key)
            p = jax.tree_util.tree_map(lambda a: a, p)
            first = jax.tree_util.tree_leaves(p)[0]
            return jax.tree_util.tree_map(
                lambda a: a + 0.0 * total.astype(a.dtype), p), total
        p, totals = jax.lax.scan(body, params, jnp.arange(REPS))
        return totals[-1]

    t_fwd = timed("forward only (loss value)", fwd_scan, params,
                  batch)

    # ---------- logit projection + xent tail, isolated ---------- #
    n = bench.BATCH * bench.MAX_OUT
    dmodel = bench.T_DIM if model == "transformer" else None
    if model == "transformer":
        x0 = jnp.asarray(
            np.random.randn(n, bench.T_DIM).astype(np.float32)) * 0.1
        table = jnp.asarray(np.random.randn(
            bench.VOCAB, bench.T_DIM).astype(np.float32)) * 0.02
        targets = jnp.asarray(
            rng.randint(0, bench.VOCAB, size=(n,)), jnp.int32)
        mask = jnp.ones((n,), jnp.float32)
        eps = 0.1

        def tail_loss(x, table):
            logits = jnp.dot(x, table.T,
                             preferred_element_type=jnp.float32)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            target_ll = jnp.take_along_axis(
                log_probs, targets[:, None], axis=-1)[:, 0]
            uniform_ll = jnp.mean(log_probs, axis=-1)
            nll = -((1.0 - eps) * target_ll + eps * uniform_ll)
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask),
                                                     1.0)

        @jax.jit
        def tail_scan(x, table):
            def body(carry, _):
                x, table = carry
                loss, (gx, gt) = jax.value_and_grad(
                    tail_loss, argnums=(0, 1))(x, table)
                return (x + 1e-30 * gx, table + 1e-30 * gt), loss
            (x, table), losses = jax.lax.scan(
                body, (x, table), jnp.arange(REPS))
            return losses[-1]

        t_tail = timed("logits+xent tail fwd+bwd (isolated)",
                       tail_scan, x0, table)

        @jax.jit
        def tail_fwd_scan(x, table):
            def body(carry, _):
                x, table = carry
                loss = tail_loss(x, table)
                return (x + 0.0 * loss, table), loss
            (x, table), losses = jax.lax.scan(
                body, (x, table), jnp.arange(REPS))
            return losses[-1]

        timed("logits+xent tail fwd only", tail_fwd_scan, x0, table)

        # pure matmul floor for the same projection (fwd+bwd = 3 GEMMs)
        @jax.jit
        def mm_scan(x, table):
            def body(carry, _):
                x, table = carry
                def f(x_, t_):
                    return jnp.sum(jnp.dot(
                        x_, t_.T, preferred_element_type=jnp.float32)
                        ** 2)
                loss, (gx, gt) = jax.value_and_grad(
                    f, argnums=(0, 1))(x, table)
                return (x + 1e-30 * gx, table + 1e-30 * gt), loss
            (x, table), losses = jax.lax.scan(
                body, (x, table), jnp.arange(REPS))
            return losses[-1]

        t_mm = timed("bare (N,D)x(D,V) fwd+bwd GEMMs", mm_scan, x0,
                     table)

    # ---------- optimizer tail ---------- #
    @jax.jit
    def opt_scan(params, opt_state, batch):
        def loss_fn(p_):
            return trainer.total_loss(p_, batch, key)
        (_, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        def body(carry, _):
            p, o = carry
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), 0.0
        (p, o), _ = jax.lax.scan(body, (params, opt_state),
                                 jnp.arange(REPS))
        return jax.tree_util.tree_leaves(p)[0]

    t_opt = timed("clip+Adam update only", opt_scan, params,
                  opt_state, batch)

    print("-" * 60)
    print(f"residual (full - grad - opt): "
          f"{t_full - t_grad - t_opt:8.3f} ms")
    if model == "transformer":
        print(f"tail share of fwd+bwd: {t_tail:.3f} of {t_grad:.3f} "
              f"ms; bare GEMM floor {t_mm:.3f} ms")
        an = bench.analytic_flops()
        print(f"analytic train GFLOP/step: "
              f"{an['transformer_train_step'] / 1e9:.1f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "transformer")
