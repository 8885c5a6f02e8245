"""Parity tests for the fused CLIP resblock Pallas kernels (interpret mode).

The fused path must match the jnp formulation (which itself is
golden-parity-tested against the torch reference in test_clip_text_parity /
test_fullsize_parity) for every dispatch regime: packed (g>1) and unpacked
attention, chunked (n_h>1) and single-chunk MLP, causal-masked and unmasked,
fp32 and bf16.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qa_tiger_tpu.models.clip_text import causal_mask, resblock_init
from qa_tiger_tpu.ops.pallas.resblock import (
    _attn_sizes,
    _mlp_sizes,
    fused_resblock,
    resblock_jnp,
)


def _params(width, key=0):
    p = resblock_init(jax.random.PRNGKey(key), width)
    # resblock_init leaves matrices zero (caller scales); fill with noise
    ks = jax.random.split(jax.random.PRNGKey(key + 1), 4)
    p["attn"]["in_proj_weight"] = 0.05 * jax.random.normal(
        ks[0], p["attn"]["in_proj_weight"].shape)
    p["attn"]["in_proj_bias"] = 0.01 * jnp.arange(
        3 * width, dtype=jnp.float32) / width
    p["attn"]["out_proj"]["weight"] = 0.05 * jax.random.normal(
        ks[1], (width, width))
    p["mlp"]["c_fc"]["weight"] = 0.05 * jax.random.normal(
        ks[2], (4 * width, width))
    p["mlp"]["c_proj"]["weight"] = 0.05 * jax.random.normal(
        ks[3], (width, 4 * width))
    p["ln_1"]["weight"] = 1.0 + 0.1 * jnp.sin(jnp.arange(width))
    p["ln_2"]["bias"] = 0.1 * jnp.cos(jnp.arange(width))
    return p


CASES = [
    # (B, S, W, heads, causal)  — text-tower-shaped (packed g>1) and
    # image-tower-shaped (g=1), small enough for interpret mode
    (8, 13, 128, 4, True),
    (8, 13, 128, 4, False),
    (2, 77, 128, 2, True),     # S=77: g=2 packing path at B=2? g=min(2,3)=2
    (3, 40, 256, 4, False),    # odd batch: g must divide B
]


@pytest.mark.parametrize("B,S,W,heads,causal", CASES)
def test_fused_resblock_matches_jnp_fp32(B, S, W, heads, causal):
    params = _params(W)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, S, W))
    mask = causal_mask(S) if causal else None
    want = resblock_jnp(params, x, heads=heads, mask=mask)
    got = fused_resblock(x, params, mask, heads, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_resblock_bf16():
    B, S, W, heads = 4, 26, 128, 4
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), _params(W))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, S, W), jnp.bfloat16)
    mask = causal_mask(S, dtype=jnp.bfloat16)
    want = resblock_jnp(params, x, heads=heads, mask=mask)
    got = fused_resblock(x, params, mask, heads, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def test_grad_matches_jnp():
    B, S, W, heads = 4, 13, 128, 4
    params = _params(W)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, S, W))
    mask = causal_mask(S)

    def loss_fused(p, x):
        return jnp.sum(jnp.square(fused_resblock(x, p, mask, heads, True)))

    def loss_jnp(p, x):
        return jnp.sum(jnp.square(resblock_jnp(p, x, heads=heads, mask=mask)))

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("B,S,W,heads,causal", [
    (8, 13, 128, 4, True),    # short-S packed regime (g=8, gS=104 is
    #                           8-aligned so the pad operands stay empty)
    (2, 77, 128, 2, True),    # shipped seq length; g=1 and gS=77 pads to
    #                           80, exercising the sublane zero-pad rows
    (4, 16, 128, 4, False),   # 8-aligned S: no pad operands in the concat
])
def test_attn_stack_softmax_matches_per_head(B, S, W, heads, causal,
                                             monkeypatch):
    """QA_TIGER_ATTN_V=stack (all heads' scores row-stacked through ONE
    softmax chain) must reproduce the per-head loop exactly: the stacked
    softmax normalizes each row independently, so padding rows and row
    order cannot change any head's probabilities."""
    import qa_tiger_tpu.ops.pallas.resblock as R

    params = _params(W)
    x = jax.random.normal(jax.random.PRNGKey(13), (B, S, W))
    mask = causal_mask(S) if causal else None
    monkeypatch.setattr(R, "ATTN_V", "")
    want = R.fused_attn_ln2(x, params, mask, heads, True)
    monkeypatch.setattr(R, "ATTN_V", "stack")
    got = R.fused_attn_ln2(x, params, mask, heads, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,S,W,heads,causal", [
    (8, 13, 128, 4, True),
    (2, 77, 128, 2, True),
    (4, 16, 128, 4, False),
])
def test_attn_pair_packing_matches_per_head(B, S, W, heads, causal,
                                            monkeypatch):
    """QA_TIGER_ATTN_PAIR=1 (two heads per score/context dot via K-dim
    packing of adjacent head lanes) must reproduce the per-head loop: the
    zero-padded Q blocks contribute exact zeros to the contraction, so the
    math is identical up to fp32 summation order."""
    import qa_tiger_tpu.ops.pallas.resblock as R

    params = _params(W)
    x = jax.random.normal(jax.random.PRNGKey(11), (B, S, W))
    mask = causal_mask(S) if causal else None
    monkeypatch.setattr(R, "ATTN_PAIR", False)
    want = R.fused_attn_ln2(x, params, mask, heads, True)
    monkeypatch.setattr(R, "ATTN_PAIR", True)
    got = R.fused_attn_ln2(x, params, mask, heads, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)
    # odd head counts must fall back to the per-head loop, not crash
    monkeypatch.setattr(R, "ATTN_PAIR", True)
    p3 = _params(192)
    x3 = jax.random.normal(jax.random.PRNGKey(12), (B, S, 192))
    m3 = causal_mask(S) if causal else None
    y3 = R.fused_attn_ln2(x3, p3, m3, 3, True)
    monkeypatch.setattr(R, "ATTN_PAIR", False)
    w3 = R.fused_attn_ln2(x3, p3, m3, 3, True)
    for g, w in zip(y3, w3):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_cpu_fallback_is_jnp_path():
    # interpret=None off-TPU must not touch Pallas (exact equality)
    B, S, W, heads = 2, 9, 128, 4
    params = _params(W)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, W))
    want = resblock_jnp(params, x, heads=heads, mask=None)
    got = fused_resblock(x, params, None, heads)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sizes_fit_vmem():
    from qa_tiger_tpu.ops.pallas.resblock import VMEM_TOTAL

    # shipped text tower (bf16) must fuse both halves with weights resident
    g, r = _attn_sizes(256, 77, 768, 2)
    assert 256 % g == 0 and (256 // g) % r == 0 and g * S_fits(g, 77)
    rm, chunks = _mlp_sizes(256, 77, 768, 2)
    assert 256 % rm == 0 and (4 * 768) % (chunks * 128) == 0
    assert 2 * 768 * 3072 * 2 <= VMEM_TOTAL
    # the wide image tower (S=577, W=1024, bf16) exceeds scoped VMEM: the
    # sizing functions must refuse rather than OOM the chip
    assert _attn_sizes(120, 577, 1024, 2) is None
    assert _mlp_sizes(120, 577, 1024, 2) is None
    # fp32 text tower: MLP weights alone are ~19 MB — must refuse
    assert _mlp_sizes(256, 77, 768, 4) is None


def S_fits(g, s):
    return g * s <= 640


class TestFusedAttnHalf:
    """The round-3 routed form: attention half fused at g=1, MLP to XLA."""

    @pytest.mark.parametrize("B,S,W,heads,causal", CASES)
    def test_matches_jnp_fp32(self, B, S, W, heads, causal):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_half_jnp,
            fused_attn_half,
        )

        params = _params(W)
        x = jax.random.normal(jax.random.PRNGKey(7), (B, S, W))
        mask = causal_mask(S) if causal else None
        want = _attn_half_jnp(params, x, heads=heads, mask=mask)
        got = fused_attn_half(x, params, mask, heads, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_unpacked_g1_regime(self):
        # S >= 48 must select g=1 (the round-2b measured win)
        g, r = _attn_sizes(256, 77, 768, 2)
        assert g == 1
        assert 256 % r == 0

    def test_bf16(self):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_half_jnp,
            fused_attn_half,
        )

        B, S, W, heads = 4, 77, 128, 4
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), _params(W))
        x = jax.random.normal(jax.random.PRNGKey(3), (B, S, W), jnp.bfloat16)
        mask = causal_mask(S, dtype=jnp.bfloat16)
        want = _attn_half_jnp(params, x, heads=heads, mask=mask)
        got = fused_attn_half(x, params, mask, heads, True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05)

    def test_grad_matches_jnp(self):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_half_jnp,
            fused_attn_half,
        )

        B, S, W, heads = 4, 13, 128, 4
        params = _params(W)
        x = jax.random.normal(jax.random.PRNGKey(9), (B, S, W))
        mask = causal_mask(S)

        def loss_fused(p, x):
            return jnp.sum(jnp.square(
                fused_attn_half(x, p, mask, heads, True)))

        def loss_jnp(p, x):
            return jnp.sum(jnp.square(
                _attn_half_jnp(p, x, heads=heads, mask=mask)))

        gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        gj = jax.grad(loss_jnp, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gj)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_cpu_fallback_exact(self):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_half_jnp,
            fused_attn_half,
        )

        B, S, W, heads = 2, 9, 128, 4
        params = _params(W)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, S, W))
        want = _attn_half_jnp(params, x, heads=heads, mask=None)
        got = fused_attn_half(x, params, None, heads, None)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("B,S,W,heads,causal", CASES)
    def test_ln2_variant_matches_jnp(self, B, S, W, heads, causal):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_ln2_jnp,
            fused_attn_ln2,
        )

        params = _params(W)
        x = jax.random.normal(jax.random.PRNGKey(7), (B, S, W))
        mask = causal_mask(S) if causal else None
        want_y, want_h = _attn_ln2_jnp(params, x, heads=heads, mask=mask)
        got_y, got_h = fused_attn_ln2(x, params, mask, heads, True)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=2e-5, atol=2e-5)

    def test_ln2_variant_grad(self):
        from qa_tiger_tpu.ops.pallas.resblock import (
            _attn_ln2_jnp,
            fused_attn_ln2,
        )

        B, S, W, heads = 4, 13, 128, 4
        params = _params(W)
        x = jax.random.normal(jax.random.PRNGKey(9), (B, S, W))
        mask = causal_mask(S)

        def loss(fn):
            def f(p, x):
                y, h = fn(p, x)
                return jnp.sum(jnp.square(y)) + jnp.sum(h * h * 0.5)
            return f

        gf = jax.grad(loss(lambda p, x: fused_attn_ln2(x, p, mask, heads,
                                                       True)),
                      argnums=(0, 1))(params, x)
        gj = jax.grad(loss(lambda p, x: _attn_ln2_jnp(p, x, heads=heads,
                                                      mask=mask)),
                      argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gj)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_ln2_sizes_fit_text_tower(self):
        # bf16 shipped text tower must still fit with the second output
        got = _attn_sizes(256, 77, 768, 2, outs=2)
        assert got is not None
        g, r = got
        assert g == 1 and 256 % r == 0

    def test_wide_tower_refuses(self):
        # CLIP-L image tower shape exceeds scoped VMEM -> sizing refuses
        # (resblock falls back to the mha/attention_wide route)
        assert _attn_sizes(120, 577, 1024, 2) is None


def test_text_tower_end_to_end_unchanged():
    """clip_text_encode (jnp resblock path — fused_resblock is an opt-in,
    see ops/pallas/resblock.py) still runs end-to-end sane."""
    from qa_tiger_tpu.models.clip_text import clip_text_encode, clip_text_init

    params = clip_text_init(jax.random.PRNGKey(0), "ViT-B/32")
    text = jax.random.randint(jax.random.PRNGKey(1), (3, 77), 1, 49406)
    text = text.at[:, -1].set(49407)
    pooled, words = clip_text_encode(params, text, encoder_type="ViT-B/32")
    assert pooled.shape == (3, 512) and words.shape == (3, 77, 512)
    assert bool(jnp.all(jnp.isfinite(pooled)))
