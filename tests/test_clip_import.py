"""CLIP checkpoint conversion: build a small torch CLIP from the reference
classes, convert its state_dict, and check both towers produce identical
outputs through our JAX implementations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models.base import clip_base as ref_clip  # noqa: E402

from qa_tiger_tpu.convert.clip_import import (  # noqa: E402
    infer_clip_config,
    split_clip_state_dict,
)
from qa_tiger_tpu.models import clip_image, clip_text  # noqa: E402


@pytest.fixture(scope="module")
def small_clip():
    model = ref_clip.CLIP(
        embed_dim=64, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=120,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
        q_aware_N=-1).eval().float()
    return model


def test_infer_config(small_clip):
    sd = {k: v for k, v in small_clip.state_dict().items()}
    cfg = infer_clip_config(sd)
    assert cfg["embed_dim"] == 64
    assert cfg["text_layers"] == 2
    assert cfg["vision_width"] == 64
    assert cfg["patch_size"] == 8
    assert cfg["input_resolution"] == 32
    assert cfg["vocab_size"] == 120


def test_text_tower_conversion(small_clip, monkeypatch):
    monkeypatch.setitem(clip_text.CLIP_TEXT_CONFIGS, "conv-test",
                        dict(width=64, heads=4, layers=2, embed_dim=64))
    text_params, _ = split_clip_state_dict(small_clip.state_dict())
    text_params = jax.tree_util.tree_map(jnp.asarray, text_params)
    toks = np.zeros((2, 77), np.int64)
    toks[:, 0] = 118
    toks[0, 1:5] = [5, 9, 2, 119]
    toks[1, 1:3] = [7, 119]
    with torch.no_grad():
        t_out = small_clip.encode_text(torch.tensor(toks))
    j_out, _ = clip_text.clip_text_encode(text_params, jnp.asarray(toks),
                                          encoder_type="conv-test")
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=3e-5)


def test_vision_tower_conversion(small_clip, monkeypatch):
    # CLIP sets vision_heads = width // 64 (clip_base.py CLIP.__init__)
    monkeypatch.setitem(clip_image.CLIP_VISION_CONFIGS, "conv-test",
                        dict(input_resolution=32, patch_size=8, width=64,
                             layers=2, heads=1, output_dim=64))
    _, vision_params = split_clip_state_dict(small_clip.state_dict())
    vision_params = jax.tree_util.tree_map(jnp.asarray, vision_params)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_tokens = small_clip.visual(torch.tensor(imgs))
    j_cls, j_tokens = clip_image.clip_vision_encode(
        vision_params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        name="conv-test")
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(j_tokens), t_tokens.numpy(),
                               rtol=1e-4, atol=3e-5)
