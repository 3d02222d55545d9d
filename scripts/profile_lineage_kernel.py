"""Isolate the fused lineage-attention kernel path's per-step costs
at the bench decode shapes (B=64, K=10, T=48, H=8, Dh=64, 6 layers).

Components, each scan-looped on device with one sync (CLAUDE.md
timing protocol; operands are jit args, never closed-over):
  1. cache DUS, kernel layout  — k (B,H,Dh,L) lane offset step*K,
                                 v (B,H,L,Dh) sublane offset step*K
  2. cache DUS, plain layout   — (rows, T, D) at axis=1 offset step
  3. lineage bias build        — (B, K16, L) from the ancestry matrix
  4. kernel calls              — 6 x lineage_attention at full window
  5. einsum lineage block      — the old 5-D einsum path at W=48
  6. kernel-path block         — bias + 6 x (DUS + transposes + call)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from neuralmonkey_tpu.ops.lineage_attention import (
    lineage_attention, lineage_bias, lane_window)

REPS = int(os.environ.get("PROF_REPS", "50"))
B, K, H, D, NL, T = 64, 10, 8, 512, 6, 48
DH = D // H
ROWS = B * K
LANES = K * T
K16 = 16
SCALE = 1.0 / (DH ** 0.5)

rng = np.random.RandomState(0)


def arr(*shape, dtype=np.float32, scale=0.05):
    return jnp.asarray(rng.randn(*shape).astype(dtype) * scale)


def timed(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    start = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    per = (time.perf_counter() - start) / REPS * 1000
    print(f"{name:46s} {per:8.3f} ms/iter", flush=True)
    return per


@jax.jit
def dus_kernel_layout(kq, vq, k_ins, v_ins):
    def body(carry, step):
        kq, vq = carry
        new_k, new_v = [], []
        for i in range(NL):
            new_k.append(jax.lax.dynamic_update_slice(
                kq[i], k_ins, (0, 0, 0, step * K)))
            new_v.append(jax.lax.dynamic_update_slice(
                vq[i], v_ins, (0, 0, step * K, 0)))
        return (tuple(new_k), tuple(new_v)), ()
    (kq, vq), _ = jax.lax.scan(
        body, (kq, vq), jnp.arange(REPS) % T)
    return kq[0][0, 0, 0, :8]


@jax.jit
def dus_plain_layout(caches, row):
    def body(caches, step):
        out = []
        for i in range(2 * NL):
            out.append(jax.lax.dynamic_update_slice_in_dim(
                caches[i], row, step, axis=1))
        return tuple(out), ()
    caches, _ = jax.lax.scan(body, caches, jnp.arange(REPS) % T)
    return caches[0][0, 0, :8]


@jax.jit
def bias_build(anc):
    def body(acc, step):
        bias = lineage_bias(anc, step, T, K, LANES, T)
        return acc + bias[0, 0, 0], ()
    acc, _ = jax.lax.scan(
        body, jnp.float32(0.0), jnp.arange(REPS) % T)
    return acc


@jax.jit
def kernel_calls(q4, kq, vq, bias):
    def body(q4, _):
        out = q4
        for i in range(NL):
            ctx = lineage_attention(out, kq[i], vq[i], bias, LANES)
            out = out * 0.5 + ctx * 0.5
        return out, ()
    out, _ = jax.lax.scan(body, q4, jnp.arange(REPS))
    return out


@jax.jit
def einsum_block(x0, ck, cv, lineage, cache_bias):
    def body(x, _):
        out = x
        for i in range(NL):
            qh = out.reshape(B, K, H, DH)
            kh = ck[i].reshape(B, K, T, H, DH)
            vh = cv[i].reshape(B, K, T, H, DH)
            s_full = jnp.einsum(
                "bkhd,bjthd->bhkjt", qh, kh,
                preferred_element_type=jnp.float32) * SCALE
            s = jnp.einsum("bhkjt,bkjt->bhkt", s_full, lineage)
            wts = jax.nn.softmax(s + cache_bias, axis=-1)
            w_slot = wts[:, :, :, None, :] * lineage[:, None]
            ctx = jnp.einsum(
                "bhkjt,bjthd->bkhd", w_slot.astype(vh.dtype), vh,
                preferred_element_type=jnp.float32)
            out = out * 0.5 + ctx.reshape(ROWS, D) * 0.5
        return out, ()
    out, _ = jax.lax.scan(body, x0, jnp.arange(REPS))
    return out


@jax.jit
def kernel_path_block(x0, kq, vq, anc):
    def body(carry, step):
        x, kq, vq = carry
        bias = lineage_bias(anc, step, T, K, LANES, T)
        new_k, new_v = [], []
        out = x
        for i in range(NL):
            k_ins = out.reshape(B, K, H, DH).transpose(0, 2, 3, 1)
            v_ins = out.reshape(B, K, H, DH).transpose(0, 2, 1, 3)
            nk = jax.lax.dynamic_update_slice(
                kq[i], k_ins, (0, 0, 0, step * K))
            nv = jax.lax.dynamic_update_slice(
                vq[i], v_ins, (0, 0, step * K, 0))
            new_k.append(nk)
            new_v.append(nv)
            q4 = out.reshape(B, K, H, DH).transpose(0, 2, 1, 3)
            q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, K16 - K), (0, 0)))
            ctx4 = lineage_attention(q4, nk, nv, bias, LANES)
            ctx = ctx4[:, :, :K].transpose(0, 2, 1, 3).reshape(
                ROWS, D)
            out = out * 0.5 + ctx * 0.5
        return (out, tuple(new_k), tuple(new_v)), ()
    (out, kq, vq), _ = jax.lax.scan(
        body, (x0, kq, vq), jnp.arange(REPS) % T)
    return out


def main():
    kq = tuple(arr(B, H, DH, LANES) for _ in range(NL))
    vq = tuple(arr(B, H, LANES, DH) for _ in range(NL))
    k_ins = arr(B, H, DH, K)
    v_ins = arr(B, H, K, DH)
    timed("DUS kernel layout (6 x k-lane + v-sublane)",
          dus_kernel_layout, kq, vq, k_ins, v_ins)

    caches = tuple(arr(ROWS, T, D) for _ in range(2 * NL))
    row = arr(ROWS, 1, D)
    timed("DUS plain layout (12 x row into 640x48x512)",
          dus_plain_layout, caches, row)

    anc = jnp.asarray(
        rng.randint(0, K, size=(B, K, T)).astype(np.int32))
    timed("lineage bias build (B,16,480)", bias_build, anc)

    q4 = arr(B, H, K16, DH)
    bias = jnp.asarray(
        np.where(rng.rand(B, K16, LANES) < 0.1, 0.0,
                 -1e9).astype(np.float32))
    timed("kernel calls (6 x full window)", kernel_calls,
          q4, kq, vq, bias)

    x0 = arr(ROWS, D)
    ck = jnp.stack([arr(ROWS, T, D) for _ in range(NL)])
    cv = jnp.stack([arr(ROWS, T, D) for _ in range(NL)])
    lineage = (anc[:, :, None, :] == jnp.arange(
        K, dtype=jnp.int32)[None, None, :, None]).astype(jnp.float32)
    cache_bias = jnp.where(jnp.arange(T) <= T // 2, 0.0,
                           -1e9)[None, None, None, :]
    timed("einsum lineage block (6 layers, W=48)", einsum_block,
          x0, ck, cv, lineage, cache_bias)

    timed("kernel-path block (bias+DUS+transpose+call)",
          kernel_path_block, x0, kq, vq, anc)


if __name__ == "__main__":
    main()
