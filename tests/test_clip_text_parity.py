"""Parity: our JAX CLIP text tower vs the reference torch implementation,
plus full QA_TIGER forward parity with the text encoder stubbed to a small
random tower on both sides."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models.base import clip_base as ref_clip  # noqa: E402 (oracle)
from src.models import net as ref_net  # noqa: E402

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models.clip_text import causal_mask, clip_text_encode  # noqa: E402
from qa_tiger_tpu.models.qa_tiger import (  # noqa: E402
    qa_tiger_config,
    qa_tiger_forward,
)

# EMBED == WIDTH mirrors real CLIP-L/14 where text embed_dim == video_dim,
# which the reference's quest_proj input dim relies on (src/models/net.py:43)
WIDTH, HEADS, LAYERS, EMBED, VOCAB, CTX = 64, 4, 2, 64, 100, 77


class TorchTextTower(torch.nn.Module):
    """Small torch replica of CLIP_TEncoder built from reference classes."""

    def __init__(self):
        super().__init__()
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.token_embedding = torch.nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = torch.nn.Parameter(torch.randn(CTX, WIDTH) * 0.01)
        self.transformer = ref_clip.Transformer(
            WIDTH, LAYERS, HEADS, q_aware_N=-1, attn_mask=mask)
        self.ln_final = torch.nn.LayerNorm(WIDTH)
        self.text_projection = torch.nn.Parameter(torch.randn(WIDTH, EMBED) * WIDTH**-0.5)
        self.logit_scale = torch.nn.Parameter(torch.tensor(2.6592))
        self.dtype = torch.float32

    def forward(self, text):
        # reference CLIP_TEncoder.forward (src/models/encoders.py:30-37)
        x = self.token_embedding(text)
        x = x + self.positional_embedding[: x.shape[1]]
        x = x.permute(1, 0, 2)
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), torch.argmax(text, dim=-1)] @ self.text_projection
        return pooled, x

    def freeze(self):
        for p in self.parameters():
            p.requires_grad = False


def small_text_cfg_patch(monkeypatch):
    import qa_tiger_tpu.models.clip_text as ct

    monkeypatch.setitem(
        ct.CLIP_TEXT_CONFIGS, "tiny-test",
        dict(width=WIDTH, heads=HEADS, layers=LAYERS, embed_dim=EMBED),
    )


def make_tokens(b):
    rng = np.random.default_rng(7)
    toks = np.zeros((b, CTX), dtype=np.int64)
    for i in range(b):
        n = rng.integers(3, 20)
        toks[i, 0] = VOCAB - 2          # SOT-like
        toks[i, 1:n] = rng.integers(1, VOCAB - 2, n - 1)
        toks[i, n] = VOCAB - 1          # EOT = highest id
    return toks


class TestClipTextTower:
    def test_encoder_parity(self, monkeypatch):
        small_text_cfg_patch(monkeypatch)
        tower = TorchTextTower().eval()
        params = jax.tree_util.tree_map(
            jnp.asarray, state_dict_to_pytree(tower.state_dict())
        )
        toks = make_tokens(4)
        with torch.no_grad():
            t_pool, t_words = tower(torch.tensor(toks))
        j_pool, j_words = clip_text_encode(
            params, jnp.asarray(toks), encoder_type="tiny-test")
        np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(j_words), t_words.numpy(),
                                   rtol=1e-4, atol=3e-5)

    def test_causal_mask(self):
        m = np.asarray(causal_mask(5))
        assert np.all(np.isneginf(m[np.triu_indices(5, 1)]))
        assert np.all(m[np.tril_indices(5)] == 0)


class TestFullQATiger:
    def test_full_forward_parity(self, monkeypatch):
        """End-to-end: reference QA_TIGER (text encoder stubbed) vs ours."""
        small_text_cfg_patch(monkeypatch)
        tower = TorchTextTower().eval()
        monkeypatch.setattr(ref_net, "CLIP_TEncoder", lambda _name: tower)

        d_model, video_dim, patch_dim, audio_dim = 32, WIDTH, 48, 24
        topk, n_experts = 3, 5
        ref = ref_net.QA_TIGER(
            d_model=d_model, video_dim=video_dim, patch_dim=patch_dim,
            audio_dim=audio_dim, topK=topk, num_experts=n_experts,
            encoder_type="unused").eval()

        params = jax.tree_util.tree_map(
            jnp.asarray, state_dict_to_pytree(ref.state_dict())
        )
        cfg = qa_tiger_config(
            d_model=d_model, video_dim=video_dim, patch_dim=patch_dim,
            audio_dim=audio_dim, topK=topk, num_experts=n_experts,
            encoder_type="tiny-test")

        B, T, P = 4, 60, 14
        rng = np.random.default_rng(11)
        batch_np = {
            "quest": make_tokens(B),
            "audio": rng.standard_normal((B, T, audio_dim), dtype=np.float32),
            "video": rng.standard_normal((B, T, video_dim), dtype=np.float32),
            "patch": rng.standard_normal((B, T, P, patch_dim), dtype=np.float32),
        }
        with torch.no_grad():
            t_out = ref({k: torch.tensor(v) for k, v in batch_np.items()})["out"]

        fwd = jax.jit(lambda p, b: qa_tiger_forward(p, b, cfg, train=False))
        j_out = fwd(params, {k: jnp.asarray(v) for k, v in batch_np.items()})["out"]
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=2e-4, atol=5e-5)
