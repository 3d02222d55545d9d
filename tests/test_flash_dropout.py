"""Attention dropout inside the flash kernel (VERDICT r3 item 4).

Dropout inside attention is reference behavior
(nm/attention/scaled_dot_product.py applies dropout to the softmax
weights); until round 4 any ``dropout_rng`` forced the dense O(T²)
path. The kernel now draws counter-based keep bits per global
(batch·head, q·kv + k) position (``pallas_attention._keep_hash``) —
the same murmur-style hash runs in pure JAX for the dense reference
twin, so kernel and reference agree BIT-FOR-BIT on which weights drop
and the golden comparisons below are exact up to float accumulation
order. Forward + backward kernels are both exercised (interpret mode
dispatches the Pallas backward unconditionally).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from neuralmonkey_tpu.ops import kernel_config
from neuralmonkey_tpu.ops import pallas_attention as pa
from neuralmonkey_tpu.ops.attention import multi_head_attention
from neuralmonkey_tpu.ops.attention import mha_init

RNG = np.random.RandomState(11)
KEEP = 0.8


@pytest.fixture(autouse=True)
def pallas_forced(monkeypatch):
    monkeypatch.setenv("NM_USE_PALLAS", "1")
    kernel_config._use_pallas_cached.cache_clear()
    yield
    kernel_config.note_mesh(None)
    kernel_config._use_pallas_cached.cache_clear()


def _qkv(batch=2, heads=2, tq=32, tk=32, dim=8):
    q = jnp.asarray(RNG.randn(batch, heads, tq, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, tk, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, tk, dim), jnp.float32)
    return q, k, v


def _mask(batch, time, lengths):
    mask = np.zeros((batch, time), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :l] = 1.0
    return jnp.asarray(mask)


def _key():
    return pa.rng_to_key_words(jax.random.PRNGKey(42))


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference_twin(causal):
    q, k, v = _qkv()
    mask = _mask(2, 32, [32, 20])
    key = _key()
    out = pa.flash_attention(q, k, v, mask, causal, 128, 128,
                             key, KEEP)
    ref = pa._reference_flash(q, k, v, mask, causal, key, KEEP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_reference_twin(causal):
    """The dq/dkv backward kernels with the in-kernel keep mask must
    match autodiff through the dense twin (same mask by construction)."""
    q, k, v = _qkv()
    mask = _mask(2, 32, [32, 24])
    key = _key()

    def loss_kernel(q_, k_, v_):
        out = pa.flash_attention(q_, k_, v_, mask, causal, 128, 128,
                                 key, KEEP)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q_, k_, v_):
        out = pa._reference_flash(q_, k_, v_, mask, causal, key, KEEP)
        return jnp.sum(out * jnp.cos(out))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_remat_backward_replays_same_mask(monkeypatch):
    """The XLA-remat backward branch differentiates through the
    reference twin with the SAME key — its grads must match the
    Pallas backward kernels' (both recompute one identical mask)."""
    q, k, v = _qkv()
    mask = _mask(2, 32, [32, 32])
    key = _key()

    def loss(q_):
        out = pa.flash_attention(q_, k, v, mask, False, 128, 128,
                                 key, KEEP)
        return jnp.sum(out ** 2)

    g_pallas = jax.grad(loss)(q)
    # force the remat branch for the backward trace: the custom-vjp
    # bwd is traced when the cotangent is pulled, so flipping the
    # gates between jax.vjp and vjp_fn routes only the backward
    val, vjp_fn = jax.vjp(loss, q)
    monkeypatch.setattr(pa, "pallas_interpret", lambda: False)
    monkeypatch.setattr(kernel_config, "use_pallas_train",
                        lambda: False)
    (g_remat,) = vjp_fn(jnp.ones_like(val))
    np.testing.assert_allclose(np.asarray(g_pallas),
                               np.asarray(g_remat),
                               atol=1e-4, rtol=1e-4)


def test_keep_fraction_and_zeroing():
    """The realized keep mask hits ~keep_prob, dropped weights are
    exactly zero, kept ones rescale by 1/keep_prob."""
    keep = pa._keep_mask_dense(_key(), 4, 4, 64, 64, KEEP)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - KEEP) < 0.01
    # a different key draws a different mask
    other = pa._keep_mask_dense(
        pa.rng_to_key_words(jax.random.PRNGKey(7)), 4, 4, 64, 64, KEEP)
    assert bool(jnp.any(keep != other))
    # per-(batch, head) masks differ (the bh word enters the hash)
    assert bool(jnp.any(keep[0, 0] != keep[1, 1]))


def test_deterministic_given_key():
    q, k, v = _qkv()
    mask = _mask(2, 32, [32, 32])
    key = _key()
    a = pa.flash_attention(q, k, v, mask, False, 128, 128, key, KEEP)
    b = pa.flash_attention(q, k, v, mask, False, 128, 128, key, KEEP)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    nodrop = pa.flash_attention(q, k, v, mask, False, 128, 128)
    assert bool(jnp.any(a != nodrop))


def test_mha_dispatch_keeps_kernel_with_dropout(monkeypatch):
    """multi_head_attention with a dropout rng must now route to the
    flash kernel (it used to force the dense path), and grads flow."""
    calls = {"n": 0}
    real = pa._flash_attention_pallas

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(pa, "_flash_attention_pallas", counted)
    batch, t, dim, heads = 4, 16, 16, 2
    params = mha_init(jax.random.PRNGKey(0), dim, dim, dim)
    x = jnp.asarray(RNG.randn(batch, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 16, 9])
    rng = jax.random.PRNGKey(3)

    def loss(p):
        out = multi_head_attention(
            p, x, x, x, heads, None, rng, KEEP, key_mask=mask)
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert calls["n"] > 0, "dropout forced the dense path"
    assert np.isfinite(float(val))
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # NM_FLASH_DROPOUT=0 restores the dense path
    calls["n"] = 0
    monkeypatch.setenv("NM_FLASH_DROPOUT", "0")
    _ = loss(params)
    assert calls["n"] == 0


def test_sharded_dropout_masks_differ_across_shards():
    """Identical rows on different data shards must draw DIFFERENT
    dropout masks (the shard index folds into the key words)."""
    devs = np.array(jax.devices()[:2]).reshape(2)
    kernel_config.note_mesh(Mesh(devs, ("data",)))
    heads, t, dim = 2, 16, 8
    row_q = RNG.randn(1, heads, t, dim).astype(np.float32)
    row_k = RNG.randn(1, heads, t, dim).astype(np.float32)
    row_v = RNG.randn(1, heads, t, dim).astype(np.float32)
    q = jnp.asarray(np.repeat(row_q, 2, axis=0))
    k = jnp.asarray(np.repeat(row_k, 2, axis=0))
    v = jnp.asarray(np.repeat(row_v, 2, axis=0))
    mask = jnp.ones((2, t), jnp.float32)
    out = pa.flash_attention_sharded(q, k, v, mask, False,
                                     _key(), KEEP)
    assert out.shape == (2, heads, t, dim)
    assert bool(jnp.any(out[0] != out[1])), \
        "shards drew identical dropout masks"

    def loss(q_):
        o = pa.flash_attention_sharded(q_, k, v, mask, False,
                                       _key(), KEEP)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_nested_sharded_dropout_grads_match_dense_twin():
    """Inside a partial-auto body (pipe manual — the GPipe stage
    shape) the sharded flash forward draws per-shard folded keys and
    the backward runs as plain GSPMD through the dense twin with
    ``shard_fold`` reproducing those keys globally — outputs AND
    grads must match the twin exactly (one mask by construction)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "pipe"))
    kernel_config.note_mesh(mesh)
    batch, heads, t, dim = 8, 2, 16, 8
    q = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    k = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    v = jnp.asarray(RNG.randn(batch, heads, t, dim), jnp.float32)
    mask = _mask(batch, t, [16, 12, 9, 16, 3, 7, 16, 5])
    key = _key()

    def body(q_):
        return pa.flash_attention_sharded(q_, k, v, mask, False,
                                          key, KEEP)

    wrapped = jax.shard_map(
        body, mesh=mesh, in_specs=(P(),), out_specs=P(),
        axis_names={"pipe"}, check_vma=False)
    out = jax.jit(wrapped)(q)
    ref = pa._reference_flash(q, k, v, mask, False, key, KEEP,
                              shard_fold=(4, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    g = jax.jit(jax.grad(lambda q_: jnp.sum(wrapped(q_) ** 2)))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(pa._reference_flash(
        q_, k, v, mask, False, key, KEEP, shard_fold=(4, 1)) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
    kernel_config.note_mesh(None)
