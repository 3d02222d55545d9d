"""Decompose the transformer decode step's window-independent cost:
isolated scans of each per-layer block at the bench decode shapes
(B=64, K=10, rows=640, 6 layers). Run on the real TPU.

All operands are passed as jit ARGUMENTS (closed-over arrays become
giant HLO constants that stall the remote compile — CLAUDE.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = int(os.environ.get("PROF_REPS", "50"))
B, K, H, D, FF, L = 64, 10, 8, 512, 2048, 6
ROWS = B * K
DH = D // H
SRC = 32


def timed(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    start = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    per = (time.perf_counter() - start) / REPS * 1000
    print(f"{name:46s} {per:8.3f} ms/iter", flush=True)
    return per


rng = np.random.RandomState(0)


def arr(*shape, dtype=np.float32, scale=0.05):
    return jnp.asarray(rng.randn(*shape).astype(dtype) * scale)


@jax.jit
def qkvo_scan(x, wq):
    def body(x, _):
        for i in range(L):
            for j in range(4):
                x = jnp.dot(x, wq[4 * i + j],
                            preferred_element_type=jnp.float32) \
                    * 0.5 + x * 0.5
        return x, ()
    x, _ = jax.lax.scan(body, x, jnp.arange(REPS))
    return x


@jax.jit
def qkv_fused_scan(x, wqkv, wo):
    """Fused q|k|v single matmul per layer + o: 2 matmuls/layer."""
    def body(x, _):
        for i in range(L):
            qkv = jnp.dot(x, wqkv[i],
                          preferred_element_type=jnp.float32)
            x = jnp.dot(qkv[:, :D], wo[i],
                        preferred_element_type=jnp.float32) \
                * 0.5 + x * 0.5
        return x, ()
    x, _ = jax.lax.scan(body, x, jnp.arange(REPS))
    return x


@jax.jit
def ffn_scan(x, wff):
    def body(x, _):
        for i in range(L):
            h = jax.nn.relu(jnp.dot(
                x, wff[i][0], preferred_element_type=jnp.float32))
            x = jnp.dot(h, wff[i][1],
                        preferred_element_type=jnp.float32) \
                * 0.5 + 0.5 * x
        return x, ()
    x, _ = jax.lax.scan(body, x, jnp.arange(REPS))
    return x


def make_selfatt(w, dtype):
    scale = 1.0 / (DH ** 0.5)

    @jax.jit
    def selfatt_scan(q0, ck, cv, lineage, cache_bias):
        def body(q, _):
            out = q
            for i in range(L):
                qh = out.reshape(B, K, H, DH).astype(dtype)
                kh = ck[i].reshape(B, K, w, H, DH)
                vh = cv[i].reshape(B, K, w, H, DH)
                s_full = jnp.einsum(
                    "bkhd,bjthd->bhkjt", qh, kh,
                    preferred_element_type=jnp.float32) * scale
                s = jnp.einsum("bhkjt,bkjt->bhkt", s_full, lineage)
                wts = jax.nn.softmax(s + cache_bias, axis=-1)
                w_slot = jnp.einsum("bhkt,bkjt->bhkjt", wts,
                                    lineage).astype(dtype)
                ctx = jnp.einsum("bhkjt,bjthd->bkhd", w_slot, vh,
                                 preferred_element_type=jnp.float32)
                out = ctx.reshape(ROWS, D)
            return out, ()
        q, _ = jax.lax.scan(body, q0, jnp.arange(REPS))
        return q
    return selfatt_scan


@jax.jit
def cross_scan(q0, enc_k, enc_v, enc_bias):
    scale = 1.0 / (DH ** 0.5)

    def body(q, _):
        out = q
        for i in range(L):
            qe = out.reshape(B, K, H, DH)
            ke = enc_k[i].reshape(B, SRC, H, DH)
            ve = enc_v[i].reshape(B, SRC, H, DH)
            s_e = jnp.einsum("bkhd,bthd->bhkt", qe, ke,
                             preferred_element_type=jnp.float32) \
                * scale
            w_e = jax.nn.softmax(s_e + enc_bias, axis=-1)
            cr = jnp.einsum("bhkt,bthd->bkhd", w_e, ve,
                            preferred_element_type=jnp.float32)
            out = cr.reshape(ROWS, D)
        return out, ()
    q, _ = jax.lax.scan(body, q0, jnp.arange(REPS))
    return q


@jax.jit
def cache_scan(caches, row):
    W = caches[0].shape[1]

    def body(carry, step):
        caches, row = carry
        new = []
        for c in caches:
            new.append(jax.lax.dynamic_update_slice_in_dim(
                c, row[:, None, :].astype(c.dtype), step % W, axis=1))
        row = row + new[0][:, 0, :].astype(row.dtype) * 1e-20
        return (tuple(new), row), ()
    (caches, row), _ = jax.lax.scan(
        body, (caches, row), jnp.arange(REPS))
    return row


@jax.jit
def ln_scan(x, ln_scale):
    def body(x, _):
        for i in range(13):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = x + (x - mu) * jax.lax.rsqrt(var + 1e-6) \
                * ln_scale[i] * 0.01
        return x, ()
    x, _ = jax.lax.scan(body, x, jnp.arange(REPS))
    return x


def main():
    x0 = arr(ROWS, D)
    wq = jnp.stack([arr(D, D) for _ in range(4 * L)])
    wqkv = jnp.stack([arr(D, 3 * D) for _ in range(L)])
    wo = jnp.stack([arr(D, D) for _ in range(L)])
    wff = [(arr(D, FF), arr(FF, D)) for _ in range(L)]

    timed("QKVO projections (24 x 640x512x512)", qkvo_scan, x0, wq)
    timed("fused QKV + O (12 matmuls)", qkv_fused_scan, x0, wqkv, wo)
    timed("FFN (6 x 640x512x2048x2)", ffn_scan, x0, wff)

    anc = jnp.asarray(
        rng.randint(0, K, size=(B, K, 48)).astype(np.int32))
    for w in (48, 12):
        ck = jnp.stack([arr(ROWS, w, D) for _ in range(L)])
        cv = jnp.stack([arr(ROWS, w, D) for _ in range(L)])
        lineage = (anc[:, :, None, :w] == jnp.arange(
            K, dtype=jnp.int32)[None, None, :, None]).astype(
                jnp.float32)
        cache_bias = jnp.where(jnp.arange(w) <= w // 2, 0.0,
                               -1e9)[None, None, None, :]
        timed(f"lineage self-att f32 (6 layers, W={w})",
              make_selfatt(w, jnp.float32), x0, ck, cv, lineage,
              cache_bias)
        if w == 48:
            timed(f"lineage self-att bf16 caches (W={w})",
                  make_selfatt(w, jnp.bfloat16), x0,
                  ck.astype(jnp.bfloat16), cv.astype(jnp.bfloat16),
                  lineage, cache_bias)

    enc_k = jnp.stack([arr(B, SRC, D) for _ in range(L)])
    enc_v = jnp.stack([arr(B, SRC, D) for _ in range(L)])
    enc_bias = jnp.zeros((B, 1, 1, SRC))
    timed("cross-att (6 layers, shared enc K/V)", cross_scan, x0,
          enc_k, enc_v, enc_bias)

    caches = tuple(arr(ROWS, 48, D) for _ in range(2 * L))
    timed("cache updates (12 x row into 640x48x512)", cache_scan,
          caches, x0)

    ln_scale = jnp.stack([arr(D, scale=1.0) for _ in range(13)])
    timed("13 layer-norms + residuals (640x512)", ln_scan, x0,
          ln_scale)


if __name__ == "__main__":
    main()
