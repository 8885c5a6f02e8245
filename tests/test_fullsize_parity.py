"""Golden parity at the SHIPPED configuration (configs/qa-tiger/vitl14.py:
d_model 512, video 768, patch 1024, audio 128, topK 7, experts 7, real
CLIP-L/14 text-tower shape) — where fp32 accumulation order and the fused
kernel actually matter. Complements the tiny-dim module tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models import net as ref_net  # noqa: E402
from src.models.base import clip_base as ref_clip  # noqa: E402

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models.qa_tiger import (  # noqa: E402
    qa_tiger_config,
    qa_tiger_forward,
)

# the shipped model (configs/qa-tiger/vitl14.py:39-47); text tower is the
# real ViT-L/14@336px text config (width 768, 12 layers, 12 heads, 49408
# vocab) at random init — throughput/numerics don't depend on weight values
D_MODEL, VIDEO_DIM, PATCH_DIM, AUDIO_DIM = 512, 768, 1024, 128
TOPK, EXPERTS = 7, 7
WIDTH, HEADS, LAYERS, EMBED, VOCAB, CTX = 768, 12, 12, 768, 49408, 77
B, T, P = 2, 60, 14


class TorchClipLTextTower(torch.nn.Module):
    """CLIP_TEncoder at the real ViT-L/14 text shape, built from the
    reference's transformer classes (src/models/encoders.py:13-37)."""

    def __init__(self):
        super().__init__()
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.token_embedding = torch.nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(CTX, WIDTH) * 0.01)
        self.transformer = ref_clip.Transformer(
            WIDTH, LAYERS, HEADS, q_aware_N=-1, attn_mask=mask)
        self.ln_final = torch.nn.LayerNorm(WIDTH)
        self.text_projection = torch.nn.Parameter(
            torch.randn(WIDTH, EMBED) * WIDTH ** -0.5)
        self.dtype = torch.float32

    def forward(self, text):
        x = self.token_embedding(text)
        x = x + self.positional_embedding[: x.shape[1]]
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]),
                   torch.argmax(text, dim=-1)] @ self.text_projection
        return pooled, x

    def freeze(self):
        for p in self.parameters():
            p.requires_grad = False


def make_tokens(b, rng):
    toks = np.zeros((b, CTX), dtype=np.int64)
    for i in range(b):
        n = int(rng.integers(5, 30))
        toks[i, 0] = VOCAB - 2
        toks[i, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        toks[i, n] = VOCAB - 1
    return toks


class TestShippedSizeParity:
    def test_full_net_fp32(self, monkeypatch):
        torch.manual_seed(0)
        tower = TorchClipLTextTower().eval()
        monkeypatch.setattr(ref_net, "CLIP_TEncoder", lambda _name: tower)
        ref = ref_net.QA_TIGER(
            d_model=D_MODEL, video_dim=VIDEO_DIM, patch_dim=PATCH_DIM,
            audio_dim=AUDIO_DIM, topK=TOPK, num_experts=EXPERTS,
            encoder_type="unused").eval()

        rng = np.random.default_rng(0)
        batch = {
            "quest": make_tokens(B, rng),
            "audio": rng.standard_normal((B, T, AUDIO_DIM)).astype(np.float32),
            "video": rng.standard_normal((B, T, VIDEO_DIM)).astype(np.float32),
            "patch": rng.standard_normal((B, T, P, PATCH_DIM)).astype(np.float32),
        }
        with torch.no_grad():
            t_out = ref({k: torch.tensor(v) for k, v in batch.items()})["out"]
        t_out = t_out.numpy()

        params = jax.tree_util.tree_map(
            jnp.asarray, state_dict_to_pytree(ref.state_dict()))
        cfg = qa_tiger_config(
            d_model=D_MODEL, video_dim=VIDEO_DIM, patch_dim=PATCH_DIM,
            audio_dim=AUDIO_DIM, topK=TOPK, num_experts=EXPERTS,
            encoder_type="ViT-L/14@336px")
        j_out = np.asarray(qa_tiger_forward(
            params, {k: jnp.asarray(v) for k, v in batch.items()}, cfg,
            train=False)["out"])

        assert j_out.shape == t_out.shape == (B, 42)
        # fp32 at 512/768-wide contractions: reduction-order differences
        # accumulate to ~1e-4 absolute on O(1) logits
        np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=5e-4)
        assert (j_out.argmax(1) == t_out.argmax(1)).all()

    def test_fused_kernel_interpret_shipped_dims(self):
        """Fused Pallas Gaussian-MoE in interpret mode vs the unfused XLA
        path at the shipped sizes (D=512, E=7, K=7, T=60) — the kernel the
        TPU actually runs, numerically pinned at full width."""
        from qa_tiger_tpu.ops.pallas.gaussian_moe import fused_gaussian_moe
        from qa_tiger_tpu.ops.tempmoe import (
            combined_expert_weights,
            experts_forward,
            gaussian_expert_aggregate,
        )

        rng = np.random.default_rng(1)
        D, H, E, K, b, t = D_MODEL, D_MODEL // 2, EXPERTS, TOPK, 4, T
        x = jnp.asarray(rng.standard_normal((b, t, D)).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((E, H, D)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal((E, H)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.standard_normal((E, D, H)).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)
        gauss_w = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((b, K, t)).astype(np.float32)), -1)
        topk_inds = jnp.stack([jax.random.permutation(
            jax.random.PRNGKey(i), E)[:K] for i in range(b)])
        topk_probs = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((b, K)).astype(np.float32)), -1)

        w_bet = combined_expert_weights(gauss_w, topk_inds, topk_probs, E,
                                        "reference")
        fused = fused_gaussian_moe(
            x, jnp.transpose(w1, (0, 2, 1)), b1, jnp.transpose(w2, (0, 2, 1)),
            b2, w_bet, batch_tile=2, interpret=True)
        expert_out = experts_forward(w1, b1, w2, b2, x)
        unfused = gaussian_expert_aggregate(
            expert_out, gauss_w, topk_inds, topk_probs,
            gather_mode="reference")
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   rtol=2e-4, atol=2e-4)
