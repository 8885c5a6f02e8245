"""Fused attention kernel: parity (interpret mode), gradients, masks, and
mha integration (need_weights=False path equals the weights path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu import nn as qnn
from qa_tiger_tpu.ops.pallas.attention import _reference_impl, fused_attention

RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


@pytest.mark.parametrize("bh,sq,sk,dh", [(6, 77, 77, 64), (10, 1, 60, 64),
                                         (8, 14, 14, 64), (5, 60, 60, 32)])
def test_kernel_matches_reference(bh, sq, sk, dh):
    q, k, v = rand(bh, sq, dh), rand(bh, sk, dh), rand(bh, sk, dh)
    scale = dh ** -0.5
    expected = _reference_impl(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               None, scale)
    got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          None, scale, bh_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_kernel_with_causal_mask():
    bh, s, dh = 6, 12, 32
    q, k, v = rand(bh, s, dh), rand(bh, s, dh), rand(bh, s, dh)
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)
    scale = dh ** -0.5
    expected = _reference_impl(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               mask, scale)
    got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          mask, scale, bh_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_reference():
    bh, s, dh = 4, 10, 32
    q, k, v = (jnp.asarray(rand(bh, s, dh)) for _ in range(3))
    scale = dh ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, None, scale, bh_tile=2,
                                       interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_impl(q, k, v, None, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_mha_no_weights_path_matches_weights_path():
    torch = pytest.importorskip("torch")
    d, nhead = 64, 8
    tm = torch.nn.MultiheadAttention(d, nhead).eval()
    params = {
        "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj": {
            "weight": jnp.asarray(tm.out_proj.weight.detach().numpy()),
            "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
    }
    q = jnp.asarray(rand(3, 20, d))
    kv = jnp.asarray(rand(3, 15, d))
    out_w, w = qnn.mha(params, q, kv, kv, num_heads=nhead, need_weights=True)
    out_nw, none_w = qnn.mha(params, q, kv, kv, num_heads=nhead,
                             need_weights=False)
    assert none_w is None
    assert w is not None
    np.testing.assert_allclose(np.asarray(out_nw), np.asarray(out_w),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,sq,W,heads", [(8, 77, 128, 4), (16, 14, 64, 2)])
def test_wide_kernel_key_bias(B, sq, W, heads):
    """ToMe proportional attention: log(size) per-key bias through the wide
    kernel (covers both the g=1 and packed g>1 regimes)."""
    from qa_tiger_tpu.ops.pallas.attention import (
        _wide_reference,
        attention_wide,
    )

    q, k, v = (jnp.asarray(rand(B, sq, W)) for _ in range(3))
    sizes = jnp.asarray(1.0 + RNG.integers(0, 5, (B, sq)).astype(np.float32))
    kb = jnp.log(sizes)
    want = _wide_reference(q, k, v, None, 0.125, heads, kb)
    got = attention_wide(q, k, v, None, 0.125, heads, interpret=True,
                         key_bias=kb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_wide_kernel_key_bias_grad():
    from qa_tiger_tpu.ops.pallas.attention import (
        _wide_reference,
        attention_wide,
    )

    B, sq, W, heads = 4, 13, 64, 2
    q, k, v = (jnp.asarray(rand(B, sq, W)) for _ in range(3))
    kb = jnp.asarray(rand(B, sq))

    def f_kernel(q, k, v):
        return jnp.sum(jnp.square(attention_wide(
            q, k, v, None, 0.2, heads, interpret=True, key_bias=kb)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.square(_wide_reference(
            q, k, v, None, 0.2, heads, kb)))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_wide_kernel_key_bias_receives_grad():
    """d/d(key_bias) must flow through the kernel path: key_bias is
    log(size) in ToMe proportional attention and size is itself a
    differentiable function of the tokens — the kernel VJP used to drop it
    (returned None) while the off-TPU path propagated it."""
    from qa_tiger_tpu.ops.pallas.attention import (
        _wide_reference,
        attention_wide,
    )

    B, sq, W, heads = 4, 13, 64, 2
    q, k, v = (jnp.asarray(rand(B, sq, W)) for _ in range(3))
    kb = jnp.asarray(rand(B, sq))

    g_kernel = jax.grad(lambda b: jnp.sum(jnp.square(attention_wide(
        q, k, v, None, 0.2, heads, interpret=True, key_bias=b))))(kb)
    g_ref = jax.grad(lambda b: jnp.sum(jnp.square(_wide_reference(
        q, k, v, None, 0.2, heads, b))))(kb)
    assert float(jnp.max(jnp.abs(g_ref))) > 0  # the bias genuinely matters
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)
