"""Golden-tensor parity vs the PyTorch reference modules (eval mode).

Imports the read-only reference at /root/reference as a numerical oracle:
instantiate each torch module with random weights, copy the state_dict into
our pytree via the converter, and compare forward outputs at fp32 tolerance.
This is the SURVEY.md §4/§7 test strategy (the reference itself has no test
suite).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models import modules as ref_modules  # noqa: E402  (reference oracle)

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models import modules as M  # noqa: E402

B, T, P, D = 3, 60, 14, 64  # small d_model keeps the oracle fast
RNG = np.random.default_rng(42)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


def to_pytree(module):
    return jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_pytree(module.state_dict())
    )


class TestAVQCrossAttn:
    def test_forward_parity(self):
        ref = ref_modules.AVQCrossAttn(D, 8).eval()
        params = to_pytree(ref)
        audio, video, words = rand(B, T, D), rand(B, T, D), rand(B, 7, D)
        with torch.no_grad():
            t_a, t_v = ref(torch.tensor(audio), torch.tensor(video),
                           torch.tensor(words))
        j_a, j_v = M.avq_cross_attn(
            params, jnp.asarray(audio), jnp.asarray(video), jnp.asarray(words),
            nhead=8)
        np.testing.assert_allclose(np.asarray(j_a), t_a.numpy(), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), rtol=1e-4, atol=2e-5)

    def test_visualize_weights_parity(self):
        ref = ref_modules.AVQCrossAttn(D, 8).eval()
        params = to_pytree(ref)
        audio, video, words = rand(B, T, D), rand(B, T, D), rand(B, 7, D)
        with torch.no_grad():
            _, _, (t_aw, t_vw) = ref(torch.tensor(audio), torch.tensor(video),
                                     torch.tensor(words), visualize=True)
        _, _, (j_aw, j_vw) = M.avq_cross_attn(
            params, jnp.asarray(audio), jnp.asarray(video), jnp.asarray(words),
            nhead=8, visualize=True)
        np.testing.assert_allclose(np.asarray(j_aw), t_aw.numpy(), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_vw), t_vw.numpy(), rtol=1e-4, atol=2e-5)


class TestAVCrossAttn:
    def test_forward_parity(self):
        ref = ref_modules.AVCrossAttn(D, 8).eval()
        params = to_pytree(ref)
        a, v = rand(B, T, D), rand(B, T, D)
        with torch.no_grad():
            t_a, t_v = ref(torch.tensor(a), torch.tensor(v))
        j_a, j_v = M.av_cross_attn(params, jnp.asarray(a), jnp.asarray(v), nhead=8)
        np.testing.assert_allclose(np.asarray(j_a), t_a.numpy(), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), rtol=1e-4, atol=2e-5)


class TestQstGrounding:
    def test_single_stream(self):
        ref = ref_modules.QstGrounding(D, 8).eval()
        params = to_pytree(ref)
        qst, data = rand(B, D), rand(B, T, D)
        with torch.no_grad():
            t_out = ref(torch.tensor(qst), torch.tensor(data))
        j_out = M.qst_grounding(params, jnp.asarray(qst), jnp.asarray(data), nhead=8)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=2e-5)

    def test_stream_list(self):
        ref = ref_modules.QstGrounding(D, 8).eval()
        params = to_pytree(ref)
        qst = rand(B, D)
        d1, d2 = rand(B, 1, D), rand(B, 1, D)
        with torch.no_grad():
            t_out = ref(torch.tensor(qst), [torch.tensor(d1), torch.tensor(d2)])
        j_out = M.qst_grounding(params, jnp.asarray(qst),
                                [jnp.asarray(d1), jnp.asarray(d2)], nhead=8)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=1e-4, atol=2e-5)


class TestPatchSelecter:
    def test_forward_parity(self):
        ref = ref_modules.PatchSelecter(D, 8).eval()
        params = to_pytree(ref)
        patch, audio, video = rand(B, T, P, D), rand(B, T, D), rand(B, T, D)
        with torch.no_grad():
            t_a, t_v = ref(torch.tensor(patch), torch.tensor(audio),
                           torch.tensor(video))
        j_a, j_v = M.patch_selecter(params, jnp.asarray(patch),
                                    jnp.asarray(audio), jnp.asarray(video),
                                    nhead=8)
        np.testing.assert_allclose(np.asarray(j_a), t_a.numpy(), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), rtol=1e-4, atol=2e-5)


class TestTempMoE:
    @pytest.mark.parametrize("topk,n_experts", [(7, 7), (3, 10), (1, 4)])
    def test_audio_branch(self, topk, n_experts):
        ref = ref_modules.TempMoE(D, 8, topK=topk, n_experts=n_experts).eval()
        params = to_pytree(ref)
        qst, data = rand(B, D), rand(B, T, D)
        with torch.no_grad():
            t_out = ref(torch.tensor(qst), torch.tensor(data))
        j_out = M.temp_moe(params, jnp.asarray(qst), jnp.asarray(data),
                           nhead=8, topK=topk, n_experts=n_experts)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=1e-4, atol=3e-5)

    def test_vis_branch(self):
        ref = ref_modules.TempMoE(D, 8, topK=7, n_experts=7,
                                  vis_branch=True).eval()
        params = to_pytree(ref)
        qst, data = rand(B, D), rand(B, T, D)
        sub = [rand(B, T, D), rand(B, T, D)]
        with torch.no_grad():
            t_a, t_v = ref(torch.tensor(qst), torch.tensor(data),
                           [torch.tensor(s) for s in sub])
        j_a, j_v = M.temp_moe(params, jnp.asarray(qst), jnp.asarray(data),
                              [jnp.asarray(s) for s in sub],
                              nhead=8, topK=7, n_experts=7)
        np.testing.assert_allclose(np.asarray(j_a), t_a.numpy(), rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), rtol=1e-4, atol=3e-5)

    def test_gaussian_generator_parity(self):
        """Directly check generate_gaussian vs our closed form."""
        n_experts, topk = 7, 7
        ref = ref_modules.TempMoE(D, 8, topK=topk, n_experts=n_experts).eval()
        pred = RNG.standard_normal((B, n_experts, 2)).astype(np.float32)
        # reference applies tanh*margin / sigmoid in-place before calling
        margin = 1 / (2 * n_experts)
        pred[:, :, 0] = np.tanh(pred[:, :, 0]) * margin
        pred[:, :, 1] = 1 / (1 + np.exp(-pred[:, :, 1]))
        inds = np.stack([RNG.permutation(n_experts)[:topk] for _ in range(B)])
        with torch.no_grad():
            t_g = ref.generate_gaussian(torch.tensor(pred),
                                        torch.tensor(inds), T=60)
        from qa_tiger_tpu.ops.tempmoe import gaussian_weights

        base = np.linspace(margin, 1 - margin, n_experts, dtype=np.float32)
        centers = base[None] + pred[:, :, 0]
        sel_c = np.take_along_axis(centers, inds, axis=1)
        sel_w = np.take_along_axis(pred[:, :, 1], inds, axis=1)
        j_g = gaussian_weights(jnp.asarray(sel_c), jnp.asarray(sel_w), 60, 9.0)
        np.testing.assert_allclose(np.asarray(j_g), t_g.numpy(), rtol=1e-4, atol=1e-5)
