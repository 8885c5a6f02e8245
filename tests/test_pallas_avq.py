"""Parity for the fused AVQCrossAttn train kernels (ops/pallas/avq.py):
fused forward + hand-written fused backward vs the masked jnp oracle
(models.modules.avq_sub_forward_masked), identical dropout realization via
explicit masks — the PatchSelecter train-kernel contract applied to AVQ
(reference: src/models/modules.py:159-265).

All Pallas checks run in interpret mode pinned to CPU (exact fp32); the
TPU lowering is exercised by scripts/tpu_smoke.py on real chips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models import modules as M
from qa_tiger_tpu.ops.pallas.avq import fused_avq_train

RNG = np.random.default_rng(7)


def _setup(N=5, T=6, S=9, D=32, heads=4, p=0.1, seed=3, dtype="float32"):
    dt = jnp.dtype(dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dt),
        M.avq_cross_attn_init(jax.random.PRNGKey(0), D))
    src = jnp.asarray(RNG.standard_normal((N, T, D)), dt)
    val = jnp.asarray(RNG.standard_normal((N, T, D)), dt)
    wrd = jnp.asarray(RNG.standard_normal((N, S, D)), dt)
    masks = M.make_avq_dropout_masks(
        jax.random.PRNGKey(seed), N, T, S, D, nhead=heads, dropout_p=p,
        dtype=dt)
    return params, src, val, wrd, masks


class TestFusedAVQTrain:
    def test_forward_parity_vs_masked_jnp(self):
        params, src, val, wrd, masks = _setup()
        want = M.avq_sub_forward_masked(params, src, val, wrd, masks,
                                        nhead=4)
        got = fused_avq_train(src, val, wrd, params, masks, 4, 2, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=2e-6)

    def test_allones_masks_match_eval_path(self):
        # p=0 masks are exactly 1.0, so the masked oracle must agree with
        # the rng-free eval sub-forward (same math, different attention
        # routing -> fp32-rounding-level agreement, not bitwise)
        params, src, val, wrd, _ = _setup()
        ones = M.make_avq_dropout_masks(
            jax.random.PRNGKey(0), 5, 6, 9, 32, nhead=4, dropout_p=0.0)
        got = fused_avq_train(src, val, wrd, params, ones, 4, 2, True)
        want, _ = M._avq_sub_forward(params, src, val, wrd, nhead=4,
                                     dropout_p=0.0, train=False, rng=None,
                                     need_weights=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_fused_backward_matches_masked_jnp_grads(self):
        params, src, val, wrd, masks = _setup(N=4, T=5, S=7)

        def loss_fused(s, v, q, pr):
            out = fused_avq_train(s, v, q, pr, masks, 4, 2, True)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(out))

        def loss_ref(s, v, q, pr):
            out = M.avq_sub_forward_masked(pr, s, v, q, masks, nhead=4)
            return jnp.sum(out ** 2) + jnp.sum(jnp.sin(out))

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            src, val, wrd, params)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            src, val, wrd, params)
        for got, want in zip(jax.tree_util.tree_leaves(g_f),
                             jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=1e-4)

    def test_ragged_padding_forward_and_backward(self):
        # N=5 with tile=2 -> one padded batch row; padded rows must not
        # perturb outputs or gradients
        params, src, val, wrd, masks = _setup(N=5)

        def loss_fused(s):
            return jnp.sum(
                fused_avq_train(s, val, wrd, params, masks, 4, 2, True) ** 2)

        def loss_ref(s):
            return jnp.sum(
                M.avq_sub_forward_masked(params, s, val, wrd, masks,
                                         nhead=4) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fused)(src)),
            np.asarray(jax.grad(loss_ref)(src)), rtol=2e-3, atol=1e-4)

    @pytest.mark.parametrize("N,T,S,D,heads,tile,dtype", [
        (3, 4, 5, 16, 2, 3, "float32"),     # ragged tile, tiny dims
        (4, 6, 9, 64, 8, 2, "float32"),     # shipped head count
        (2, 5, 7, 32, 4, 2, "bfloat16"),    # bf16 streams
    ])
    def test_geometry_forward(self, N, T, S, D, heads, tile, dtype):
        params, src, val, wrd, masks = _setup(N=N, T=T, S=S, D=D,
                                              heads=heads, dtype=dtype)
        want = M.avq_sub_forward_masked(params, src, val, wrd, masks,
                                        nhead=heads)
        got = fused_avq_train(src, val, wrd, params, masks, heads, tile,
                              True)
        tol = dict(rtol=1e-5, atol=2e-6) if dtype == "float32" \
            else dict(rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), **tol)

    def test_stack_matches_per_head_loop(self):
        """AVQ_V=stack (every head's scores/dsoftmax through ONE stacked
        chain, the resblock round-5 layout) must reproduce the per-head
        loop exactly — softmax and its gradient act on rows independently,
        so stacking (with discarded uniform pad rows) cannot change any
        head's numbers. T=6 forces Tp=8 so the pad rows are exercised."""
        import qa_tiger_tpu.ops.pallas.avq as A

        params, src, val, wrd, masks = _setup(N=4, T=6, S=9)

        def run():
            def loss(s, pr):
                out = fused_avq_train(s, val, wrd, pr, masks, 4, 2, True)
                return jnp.sum(out ** 2)

            out = fused_avq_train(src, val, wrd, params, masks, 4, 2, True)
            return [out] + list(jax.tree_util.tree_leaves(
                jax.grad(loss, argnums=(0, 1))(src, params)))

        orig = A.AVQ_V
        try:
            A.AVQ_V = ""
            want = run()
            A.AVQ_V = "stack"
            got = run()
        finally:
            A.AVQ_V = orig
        # forward near-bitwise; grads see fp32 accumulation-order noise
        # (XLA vectorizes the stacked-shape reductions differently), so
        # they get the file's established grad bar
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=2e-5, atol=2e-6)
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=2e-5)

    def test_param_grads_cover_every_leaf(self):
        # every AVQ parameter leaf must receive a finite, generally nonzero
        # gradient through the hand-written backward
        params, src, val, wrd, masks = _setup(N=4, T=5, S=7)

        def loss(pr):
            return jnp.sum(
                fused_avq_train(src, val, wrd, pr, masks, 4, 2, True) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves_with_path(g)
        assert len(leaves) == len(jax.tree_util.tree_leaves(params))
        for path, leaf in leaves:
            assert np.all(np.isfinite(np.asarray(leaf))), path
            assert float(np.abs(np.asarray(leaf)).max()) > 0, path


class TestModuleDispatch:
    def test_train_routing_is_deterministic_and_shaped(self):
        # avq_cross_attn under train+dropout routes through the fused path
        # (jnp-masked fallback on CPU) and is deterministic in the rng
        D = 32
        params = M.avq_cross_attn_init(jax.random.PRNGKey(0), D)
        a = jnp.asarray(RNG.standard_normal((3, 6, D)), jnp.float32)
        v = jnp.asarray(RNG.standard_normal((3, 6, D)), jnp.float32)
        w = jnp.asarray(RNG.standard_normal((3, 9, D)), jnp.float32)
        o1 = M.avq_cross_attn(params, a, v, w, nhead=4, dropout_p=0.1,
                              train=True, rng=jax.random.PRNGKey(5))
        o2 = M.avq_cross_attn(params, a, v, w, nhead=4, dropout_p=0.1,
                              train=True, rng=jax.random.PRNGKey(5))
        assert o1[0].shape == (3, 6, D) and o1[1].shape == (3, 6, D)
        np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
        np.testing.assert_array_equal(np.asarray(o1[1]), np.asarray(o2[1]))

    def test_eval_path_unchanged_by_use_fused_flag(self):
        D = 32
        params = M.avq_cross_attn_init(jax.random.PRNGKey(0), D)
        a = jnp.asarray(RNG.standard_normal((2, 5, D)), jnp.float32)
        v = jnp.asarray(RNG.standard_normal((2, 5, D)), jnp.float32)
        w = jnp.asarray(RNG.standard_normal((2, 7, D)), jnp.float32)
        o1 = M.avq_cross_attn(params, a, v, w, nhead=4, train=False)
        o2 = M.avq_cross_attn(params, a, v, w, nhead=4, train=False,
                              use_fused=False)
        np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
