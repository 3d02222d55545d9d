"""Isolated A/B of the fused softmax-xent tail at bench train shapes
(N=3072 tokens, D=512, V=30000, label smoothing 0.1, tied table):
fused custom-VJP kernels vs the materialized-logits XLA path vs the
bare-GEMM floor. Scan-timed on device, one sync (CLAUDE.md protocol).

Run on the real TPU:  python scripts/profile_fused_xent.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from neuralmonkey_tpu.ops import fused_xent as fx

REPS = int(os.environ.get("PROF_REPS", "30"))
N, D, V = 64 * 48, 512, 30000
EPS = 0.1

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.3)
wt0 = jnp.asarray(rng.randn(V, D).astype(np.float32) * 0.05)
b0 = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1)
targets = jnp.asarray(rng.randint(0, V, size=(N,)), jnp.int32)
gmask = jnp.asarray(rng.rand(N).astype(np.float32))


def timed(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    start = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    per = (time.perf_counter() - start) / REPS * 1000
    print(f"{name:46s} {per:8.3f} ms/iter", flush=True)
    return per


def make_scan(tail_fn):
    def loss(x, wt, b):
        return jnp.sum(tail_fn(x, wt, b) * gmask)

    @jax.jit
    def scan(x, wt, b):
        def body(carry, _):
            x, wt, b = carry
            val, (gx, gw, gb) = jax.value_and_grad(
                loss, argnums=(0, 1, 2))(x, wt, b)
            return (x + 1e-30 * gx, wt + 1e-30 * gw,
                    b + 1e-30 * gb), val
        carry, vals = jax.lax.scan(body, (x, wt, b),
                                   jnp.arange(REPS))
        return vals[-1]
    return scan


def main():
    os.environ["NM_USE_PALLAS"] = "1"
    from neuralmonkey_tpu.ops import kernel_config
    kernel_config._use_pallas_cached.cache_clear()

    timed("unfused tail fwd+bwd (XLA log_softmax)", make_scan(
        lambda x, wt, b: fx.xent_reference(x, wt, b, targets, EPS,
                                           True)), x0, wt0, b0)
    timed("fused tail fwd+bwd (3 Pallas kernels)", make_scan(
        lambda x, wt, b: fx.fused_softmax_xent(
            x, wt, b, targets, eps=EPS, transposed=True)),
        x0, wt0, b0)

    @jax.jit
    def gemm_scan(x, wt):
        def f(x_, w_):
            return jnp.sum(jax.lax.dot_general(
                x_, w_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) ** 2)

        def body(carry, _):
            x, wt = carry
            val, (gx, gw) = jax.value_and_grad(
                f, argnums=(0, 1))(x, wt)
            return (x + 1e-30 * gx, wt + 1e-30 * gw), val
        carry, vals = jax.lax.scan(body, (x, wt), jnp.arange(REPS))
        return vals[-1]

    timed("bare (N,D)x(V,D)^T fwd+bwd GEMMs (floor x3)", gemm_scan,
          x0, wt0)


if __name__ == "__main__":
    main()
