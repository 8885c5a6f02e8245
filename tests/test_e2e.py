"""End-to-end raw-media pipeline: one jitted graph from pixels/PCM to logits."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models import clip_image, clip_text, vit
from qa_tiger_tpu.models.qa_tiger import qa_tiger_config
from qa_tiger_tpu.pipeline.e2e import e2e_config, e2e_forward, e2e_init


@pytest.fixture
def tiny(monkeypatch):
    monkeypatch.setitem(
        clip_image.CLIP_VISION_CONFIGS, "tiny-vis",
        dict(input_resolution=32, patch_size=8, width=32, layers=2, heads=4,
             output_dim=48))
    monkeypatch.setitem(
        clip_text.CLIP_TEXT_CONFIGS, "tiny-vis",
        dict(width=48, heads=4, layers=2, embed_dim=48))
    monkeypatch.setitem(
        vit.VIT_CONFIGS, "tiny-tome",
        dict(img_size=32, patch_size=8, width=24, depth=3, heads=4,
             ln_eps=1e-6))
    model_cfg = qa_tiger_config(
        d_model=32, video_dim=48, patch_dim=24, audio_dim=128,
        topK=2, num_experts=4, num_labels=42, encoder_type="tiny-vis")
    # 17 tokens - 3 layers * r=3 -> 8 tokens
    return e2e_config(model_cfg, clip_encoder="tiny-vis",
                      tome_model="tiny-tome", tome_r=3, tome_layers=3)


def test_raw_media_to_logits(tiny):
    cfg = tiny
    params = e2e_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 5
    clip_frames = jnp.asarray(
        rng.standard_normal((B, T, 32, 32, 3), dtype=np.float32))
    tome_frames = jnp.asarray(
        rng.standard_normal((B, T, 32, 32, 3), dtype=np.float32))
    audio = jnp.asarray(
        (rng.standard_normal((B, T, 16000)) * 0.1).astype(np.float32))
    toks = np.zeros((B, 77), np.int64)
    toks[:, 0] = 49406
    toks[:, 1] = 320
    toks[:, 2] = 49407
    fwd = jax.jit(lambda p, c, t, a, q: e2e_forward(p, c, t, a, q, cfg))
    out = fwd(params, clip_frames, tome_frames, audio, jnp.asarray(toks))
    assert out.shape == (B, 42)
    assert np.all(np.isfinite(np.asarray(out)))


def test_media_encoder_shapes(tiny):
    from qa_tiger_tpu.pipeline.e2e import encode_media

    cfg = tiny
    params = e2e_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, T = 2, 3
    feats = encode_media(
        params,
        jnp.asarray(rng.standard_normal((B, T, 32, 32, 3), dtype=np.float32)),
        jnp.asarray(rng.standard_normal((B, T, 32, 32, 3), dtype=np.float32)),
        jnp.asarray((rng.standard_normal((B, T, 16000)) * 0.1).astype(np.float32)),
        cfg)
    assert feats["video"].shape == (B, T, 48)
    assert feats["patch"].shape == (B, T, 8, 24)  # 17 tokens -> 8 after ToMe
    assert feats["audio"].shape == (B, T, 128)
