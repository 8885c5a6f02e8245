"""Fused Gaussian-MoE kernel: parity vs the unfused path (interpret mode on
CPU) and gradient correctness through the custom VJP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.ops.pallas.gaussian_moe import (
    _reference_impl,
    fused_gaussian_moe,
)
from qa_tiger_tpu.ops.tempmoe import (
    combined_expert_weights,
    experts_forward,
    gaussian_expert_aggregate,
)

B, T, E, K, D, H = 6, 12, 4, 2, 32, 16
RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


@pytest.fixture
def inputs():
    x = jnp.asarray(rand(B, T, D))
    w1 = jnp.asarray(rand(E, H, D) * 0.1)   # torch layout [out, in]
    b1 = jnp.asarray(rand(E, H) * 0.1)
    w2 = jnp.asarray(rand(E, D, H) * 0.1)
    b2 = jnp.asarray(rand(E, D) * 0.1)
    gauss = jnp.asarray(np.abs(rand(B, K, T)))
    inds = jnp.asarray(
        np.stack([RNG.permutation(E)[:K] for _ in range(B)]).astype(np.int32))
    probs = jax.nn.softmax(jnp.asarray(rand(B, K)), axis=-1)
    return x, w1, b1, w2, b2, gauss, inds, probs


@pytest.mark.parametrize("gather_mode", ["reference", "paper"])
def test_combined_weights_reproduce_aggregate(inputs, gather_mode):
    x, w1, b1, w2, b2, gauss, inds, probs = inputs
    expert_out = experts_forward(w1, b1, w2, b2, x)
    expected = gaussian_expert_aggregate(expert_out, gauss, inds, probs,
                                         gather_mode=gather_mode)
    w_bet = combined_expert_weights(gauss, inds, probs, E, gather_mode)
    got = _reference_impl(x, jnp.transpose(w1, (0, 2, 1)), b1,
                          jnp.transpose(w2, (0, 2, 1)), b2, w_bet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_reference_impl(inputs):
    x, w1, b1, w2, b2, gauss, inds, probs = inputs
    w_bet = combined_expert_weights(gauss, inds, probs, E, "reference")
    w1t, w2t = jnp.transpose(w1, (0, 2, 1)), jnp.transpose(w2, (0, 2, 1))
    expected = _reference_impl(x, w1t, b1, w2t, b2, w_bet)
    got = fused_gaussian_moe(x, w1t, b1, w2t, b2, w_bet,
                             batch_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_with_batch_padding(inputs):
    """B=6 with tile 4 forces a padded final tile."""
    x, w1, b1, w2, b2, gauss, inds, probs = inputs
    w_bet = combined_expert_weights(gauss, inds, probs, E, "paper")
    w1t, w2t = jnp.transpose(w1, (0, 2, 1)), jnp.transpose(w2, (0, 2, 1))
    got = fused_gaussian_moe(x, w1t, b1, w2t, b2, w_bet,
                             batch_tile=4, interpret=True)
    expected = _reference_impl(x, w1t, b1, w2t, b2, w_bet)
    assert got.shape == (B, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_reference_grads(inputs):
    x, w1, b1, w2, b2, gauss, inds, probs = inputs
    w_bet = combined_expert_weights(gauss, inds, probs, E, "reference")
    w1t, w2t = jnp.transpose(w1, (0, 2, 1)), jnp.transpose(w2, (0, 2, 1))

    def loss_fused(x, w1t, b1, w2t, b2, w):
        return jnp.sum(fused_gaussian_moe(x, w1t, b1, w2t, b2, w,
                                          batch_tile=4, interpret=True) ** 2)

    def loss_ref(x, w1t, b1, w2t, b2, w):
        return jnp.sum(_reference_impl(x, w1t, b1, w2t, b2, w) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, w1t, b1, w2t, b2, w_bet)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, w1t, b1, w2t, b2, w_bet)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_temp_moe_fused_matches_unfused():
    """End-to-end TempMoE: fused kernel path == unfused gather path."""
    from qa_tiger_tpu.models.modules import temp_moe, temp_moe_init

    params = temp_moe_init(jax.random.PRNGKey(0), D, E)
    qst = jnp.asarray(rand(B, D))
    data = jnp.asarray(rand(B, T, D))
    kwargs = dict(nhead=4, topK=K, n_experts=E, train=False, rng=None)
    out_fused = temp_moe(params, qst, data, use_fused=True, **kwargs)
    out_plain = temp_moe(params, qst, data, use_fused=False, **kwargs)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=1e-4, atol=1e-5)
