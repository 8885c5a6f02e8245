"""Parity for the fused attention kernels added in round 2:

- attention_wide / fused_attention_wide: heads-in-lanes packed attention
  (q/k/v stay [B, S, W]; block-diagonal -inf packing; optional causal mask)
- fused_patch_select: the whole PatchSelecter module as one kernel

All Pallas checks run in interpret mode pinned to CPU (exact fp32); the TPU
lowering is exercised by bench.py / the runner on real chips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models import modules as M
from qa_tiger_tpu.models.qa_tiger import qa_tiger_config, qa_tiger_init
from qa_tiger_tpu.ops.pallas.attention import (
    _wide_reference,
    attention_wide,
    fused_attention_wide,
)
from qa_tiger_tpu.ops.pallas.patch_select import (
    fused_patch_select,
    fused_patch_select_train,
)

RNG = np.random.default_rng(0)


def _qkv(b, sq, sk, w):
    return (jnp.asarray(RNG.standard_normal((b, sq, w)).astype(np.float32)),
            jnp.asarray(RNG.standard_normal((b, sk, w)).astype(np.float32)),
            jnp.asarray(RNG.standard_normal((b, sk, w)).astype(np.float32)))


class TestWideAttention:
    @pytest.mark.parametrize("b,sq,sk,w,h", [
        (8, 77, 77, 64, 4),    # text-tower shape class
        (12, 1, 60, 32, 4),    # MoE router / grounding shape class
        (6, 60, 77, 64, 8),    # AVQ cross attention shape class
        (5, 14, 14, 32, 4),    # patch shape class (odd batch)
        (2, 3, 5, 16, 2),      # degenerate tiny
    ])
    def test_parity_no_mask(self, b, sq, sk, w, h):
        q, k, v = _qkv(b, sq, sk, w)
        got = fused_attention_wide(q, k, v, None, 0.2, h, interpret=True)
        want = _wide_reference(q, k, v, None, 0.2, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_parity_causal_mask(self):
        q, k, v = _qkv(8, 77, 77, 64)
        mask = jnp.triu(jnp.full((77, 77), -jnp.inf, jnp.float32), 1)
        got = fused_attention_wide(q, k, v, mask, 0.125, 4, interpret=True)
        want = _wide_reference(q, k, v, mask, 0.125, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match_reference(self):
        q, k, v = _qkv(4, 14, 14, 32)

        def loss_fused(q, k, v):
            return jnp.sum(attention_wide(q, k, v, None, 0.2, 4,
                                          interpret=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_wide_reference(q, k, v, None, 0.2, 4) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_dispatcher_falls_back_off_tpu(self):
        # on CPU (no interpret flag) the dispatcher must use the einsum path
        q, k, v = _qkv(4, 8, 8, 32)
        got = attention_wide(q, k, v, None, 0.2, 4)
        want = _wide_reference(q, k, v, None, 0.2, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestFusedPatchSelect:
    def _setup(self, B=3, T=5, P=14, D=64):
        cfg = qa_tiger_config(d_model=D, video_dim=D, patch_dim=48,
                              audio_dim=32)
        params = qa_tiger_init(jax.random.PRNGKey(0), cfg,
                               init_text_encoder=False)["patch_selecter"]
        patch = jnp.asarray(RNG.standard_normal((B, T, P, D)).astype(np.float32))
        audio = jnp.asarray(RNG.standard_normal((B, T, D)).astype(np.float32))
        video = jnp.asarray(RNG.standard_normal((B, T, D)).astype(np.float32))
        return params, patch, audio, video

    def test_parity_vs_jnp_module(self):
        params, patch, audio, video = self._setup()
        a_ref, v_ref = M.patch_selecter_jnp(params, patch, audio, video,
                                            nhead=8)
        a_f, v_f = fused_patch_select(patch, audio, video, params, 8, 4, True)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_ref),
                                   rtol=1e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                                   rtol=1e-5, atol=2e-6)

    def test_ragged_tile_padding(self):
        # B*T = 15 not divisible by tile=4 -> pad path
        params, patch, audio, video = self._setup(B=3, T=5)
        a_ref, v_ref = M.patch_selecter_jnp(params, patch, audio, video,
                                            nhead=8)
        a_f, v_f = fused_patch_select(patch, audio, video, params, 8, 4, True)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_ref),
                                   rtol=1e-5, atol=2e-6)

    def test_gradients_flow_through_vjp(self):
        params, patch, audio, video = self._setup(B=2, T=3)

        def loss(pt, pr):
            a, v = fused_patch_select(pt, audio, video, pr, 8, 4, True)
            return jnp.sum(a ** 2) + jnp.sum(v ** 2)

        g_pt, g_pr = jax.grad(loss, argnums=(0, 1))(patch, params)

        def loss_ref(pt, pr):
            a, v = M.patch_selecter_jnp(pr, pt, audio, video, nhead=8)
            return jnp.sum(a ** 2) + jnp.sum(v ** 2)

        r_pt, r_pr = jax.grad(loss_ref, argnums=(0, 1))(patch, params)
        # cotangents come from the FUSED forward's outputs (~1e-6 off the
        # jnp forward), so gradients agree to that level, not exactly
        np.testing.assert_allclose(np.asarray(g_pt), np.asarray(r_pt),
                                   rtol=2e-3, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g_pr),
                        jax.tree_util.tree_leaves(r_pr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4)

    def test_module_dispatch_train_uses_jnp_path(self):
        """train + dropout off-TPU falls back to the (masked) jnp path and
        is deterministic in the rng."""
        params, patch, audio, video = self._setup(B=2, T=3)
        out = M.patch_selecter(params, patch, audio, video, nhead=8,
                               dropout_p=0.1, train=True,
                               rng=jax.random.PRNGKey(0), use_fused=True)
        out2 = M.patch_selecter(params, patch, audio, video, nhead=8,
                                dropout_p=0.1, train=True,
                                rng=jax.random.PRNGKey(0), use_fused=True)
        assert out[0].shape == (2, 3, 64)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))


class TestFusedPatchSelectTrain:
    """Train-mode fused forward + hand-written fused backward vs the
    masked jnp oracle (identical dropout realization via explicit masks)."""

    def _setup(self, B=3, T=5, P=14, D=64, p=0.1, seed=5):
        cfg = qa_tiger_config(d_model=D, video_dim=D, patch_dim=48,
                              audio_dim=32)
        params = qa_tiger_init(jax.random.PRNGKey(0), cfg,
                               init_text_encoder=False)["patch_selecter"]
        patch = jnp.asarray(
            RNG.standard_normal((B, T, P, D)).astype(np.float32))
        audio = jnp.asarray(RNG.standard_normal((B, T, D)).astype(np.float32))
        video = jnp.asarray(RNG.standard_normal((B, T, D)).astype(np.float32))
        masks = M.make_patch_dropout_masks(
            jax.random.PRNGKey(seed), B * T, P, D, nhead=8, dropout_p=p)
        return params, patch, audio, video, masks

    def test_forward_parity_vs_masked_jnp(self):
        params, patch, audio, video, masks = self._setup()
        a_ref, v_ref = M.patch_selecter_jnp(params, patch, audio, video,
                                            nhead=8, masks=masks)
        a_f, v_f = fused_patch_select_train(patch, audio, video, params,
                                            masks, 8, 4, True)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_ref),
                                   rtol=1e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                                   rtol=1e-5, atol=2e-6)

    def test_allones_masks_match_eval_kernel(self):
        params, patch, audio, video, _ = self._setup()
        ones = M.make_patch_dropout_masks(
            jax.random.PRNGKey(0), 15, 14, 64, nhead=8, dropout_p=0.0)
        a_t, v_t = fused_patch_select_train(patch, audio, video, params,
                                            ones, 8, 4, True)
        a_e, v_e = fused_patch_select(patch, audio, video, params, 8, 4,
                                      True)
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_e),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_e),
                                   rtol=1e-6, atol=1e-6)

    def test_fused_backward_matches_masked_jnp_grads(self):
        params, patch, audio, video, masks = self._setup(B=2, T=3)

        def loss_fused(pt, au, vi, pr):
            a, v = fused_patch_select_train(pt, au, vi, pr, masks, 8, 4,
                                            True)
            return jnp.sum(a ** 2) + jnp.sum(jnp.sin(v))

        def loss_ref(pt, au, vi, pr):
            a, v = M.patch_selecter_jnp(pr, pt, au, vi, nhead=8, masks=masks)
            return jnp.sum(a ** 2) + jnp.sum(jnp.sin(v))

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            patch, audio, video, params)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            patch, audio, video, params)
        for got, want in zip(jax.tree_util.tree_leaves(g_f),
                             jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=1e-4)

    def test_ragged_padding_backward(self):
        # B*T = 15, tile 4 -> padded rows must contribute zero gradient
        params, patch, audio, video, masks = self._setup(B=3, T=5)

        def loss_fused(pt):
            a, v = fused_patch_select_train(pt, audio, video, params, masks,
                                            8, 4, True)
            return jnp.sum(a * v)

        def loss_ref(pt):
            a, v = M.patch_selecter_jnp(params, pt, audio, video, nhead=8,
                                        masks=masks)
            return jnp.sum(a * v)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fused)(patch)),
            np.asarray(jax.grad(loss_ref)(patch)), rtol=2e-3, atol=1e-4)

    def test_masked_jnp_equals_rng_free_eval_at_p0(self):
        params, patch, audio, video, _ = self._setup()
        ones = M.make_patch_dropout_masks(
            jax.random.PRNGKey(1), 15, 14, 64, nhead=8, dropout_p=0.0)
        a_m, v_m = M.patch_selecter_jnp(params, patch, audio, video,
                                        nhead=8, masks=ones)
        a_e, v_e = M.patch_selecter_jnp(params, patch, audio, video, nhead=8)
        # all-ones masks route through the einsum path while masks=None
        # takes the wide-attention fallback — same math, different op
        # order, so agreement is fp32-rounding-level not bitwise
        np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_e),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_e),
                                   rtol=1e-4, atol=1e-5)


class TestSelfStackSoftmax:
    """QA_TIGER_PSEL_STACK=1 (all heads' self-attention scores row-stacked
    through ONE softmax chain) must reproduce the per-head loop exactly —
    softmax normalizes rows independently, so stacking order cannot change
    any head's probabilities."""

    @pytest.mark.parametrize("train", [False, True])
    def test_stack_matches_per_head(self, train, monkeypatch):
        import qa_tiger_tpu.ops.pallas.patch_select as PS

        cfg = qa_tiger_config(d_model=64, video_dim=64, patch_dim=48,
                              audio_dim=32)
        params = qa_tiger_init(jax.random.PRNGKey(0), cfg,
                               init_text_encoder=False)["patch_selecter"]
        rng = np.random.default_rng(3)
        patch = jnp.asarray(rng.standard_normal((2, 4, 14, 64)), jnp.float32)
        audio = jnp.asarray(rng.standard_normal((2, 4, 64)), jnp.float32)
        video = jnp.asarray(rng.standard_normal((2, 4, 64)), jnp.float32)
        masks = M.make_patch_dropout_masks(
            jax.random.PRNGKey(2), 8, 14, 64, nhead=8, dropout_p=0.1) \
            if train else None

        def run():
            if train:
                return fused_patch_select_train(patch, audio, video, params,
                                                masks, 8, 4, True)
            return fused_patch_select(patch, audio, video, params, 8, 4,
                                      True)

        monkeypatch.setattr(PS, "SELF_STACK", False)
        want = run()
        monkeypatch.setattr(PS, "SELF_STACK", True)
        got = run()
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-5, atol=2e-5)


class TestTrainKernelGeometry:
    """Shape/dtype generality of the train kernels (interpret mode): the
    shipped config is P=14/H=8/D=512, but nothing in the mask geometry or
    the backward derivation should be specific to it."""

    @pytest.mark.parametrize("B,T,P,D,heads,tile,dtype", [
        (2, 3, 7, 32, 4, 2, "float32"),     # odd P, fewer heads
        (2, 5, 14, 64, 8, 4, "bfloat16"),   # bf16 streams
        (1, 9, 4, 48, 2, 3, "float32"),     # B*T=9 vs tile=3, tiny P
    ])
    def test_fwd_and_grads_match_masked_jnp(self, B, T, P, D, heads, tile,
                                            dtype):
        import jax.numpy as jnp_

        dt = jnp_.dtype(dtype)
        rng = np.random.default_rng(B * 100 + P)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dt),
            qa_tiger_init(jax.random.PRNGKey(1), qa_tiger_config(
                d_model=D, video_dim=D, patch_dim=D, audio_dim=D),
                init_text_encoder=False)["patch_selecter"])
        patch = jnp.asarray(rng.standard_normal((B, T, P, D)), dt)
        audio = jnp.asarray(rng.standard_normal((B, T, D)), dt)
        video = jnp.asarray(rng.standard_normal((B, T, D)), dt)
        masks = M.make_patch_dropout_masks(
            jax.random.PRNGKey(2), B * T, P, D, nhead=heads, dropout_p=0.2,
            dtype=dt)

        def f_kernel(pt, au, vi, pr):
            a, v = fused_patch_select_train(pt, au, vi, pr, masks, heads,
                                            tile, True)
            return jnp.sum(a.astype(jnp.float32) ** 2) \
                + jnp.sum(v.astype(jnp.float32))

        def f_ref(pt, au, vi, pr):
            a, v = M.patch_selecter_jnp(pr, pt, au, vi, nhead=heads,
                                        masks=masks)
            return jnp.sum(a.astype(jnp.float32) ** 2) \
                + jnp.sum(v.astype(jnp.float32))

        tol = dict(rtol=2e-3, atol=1e-4) if dtype == "float32" \
            else dict(rtol=0.1, atol=0.05)
        np.testing.assert_allclose(
            float(f_kernel(patch, audio, video, params)),
            float(f_ref(patch, audio, video, params)), **tol)
        g_k = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(
            patch, audio, video, params)
        g_r = jax.grad(f_ref, argnums=(0, 1, 2, 3))(
            patch, audio, video, params)
        if dtype == "float32":
            for a, b in zip(jax.tree_util.tree_leaves(g_k),
                            jax.tree_util.tree_leaves(g_r)):
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(b, np.float32), **tol)
        else:
            # bf16 streams: the gradients THROUGH the final LayerNorms are
            # cancellation-dominated near-zero quantities (|gx| here is
            # ~1000x smaller than the LN parameter grads), and the kernel
            # keeps the LN input fp32 while the jnp path rounds it to bf16
            # first — so those leaves legitimately diverge at bf16 (the
            # fp32 case above pins the geometry exactly). Check the
            # well-conditioned leaves tightly and the ill-conditioned ones
            # for scale + finiteness.
            k_leaves = jax.tree_util.tree_leaves(g_k)
            r_leaves = jax.tree_util.tree_leaves(g_r)
            scale = max(float(np.linalg.norm(np.asarray(b, np.float32)))
                        for b in r_leaves)
            for a, b in zip(k_leaves, r_leaves):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                nb = float(np.linalg.norm(b))
                assert np.all(np.isfinite(a))
                if nb > 0.05 * scale:  # well-conditioned leaf
                    assert float(np.linalg.norm(a - b)) / nb < 0.05, \
                        f"grad rel-norm error {np.linalg.norm(a - b) / nb}"
                else:  # cancellation-dominated: same near-zero scale
                    assert float(np.linalg.norm(a)) < 0.1 * scale
