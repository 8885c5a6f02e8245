"""Golden parity for the CLIP ModifiedResNet tower vs the reference's
vendored torch implementation (src/models/base/clip_base.py:10-154):
Bottleneck anti-aliased strides, 3-conv stem, and AttentionPool2d."""
import numpy as np
import pytest

import jax

from conftest import load_reference_module

from qa_tiger_tpu.convert.torch_import import state_dict_to_pytree
from qa_tiger_tpu.models.clip_resnet import (
    CLIP_RESNET_CONFIGS,
    clip_resnet_encode,
    clip_resnet_init,
    resnet_config,
)

torch = pytest.importorskip("torch")

CLIP_RESNET_CONFIGS.setdefault(
    "tiny-rn", dict(layers=(1, 1, 1, 1), width=8, output_dim=32,
                    input_resolution=64))


@pytest.fixture(scope="module")
def clip_base():
    return load_reference_module("src/models/base/clip_base.py",
                                 "ref_clip_base")


def _randomize_bn_stats(model, seed=0):
    """Give running stats non-trivial values so eval-mode BN is actually
    exercised (fresh torch BN has mean=0/var=1 == identity)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


def _parity(clip_base, name, batch=2, atol=2e-4):
    cfg = resnet_config(name)
    torch.manual_seed(0)
    ref = clip_base.ModifiedResNet(
        layers=list(cfg["layers"]), output_dim=cfg["output_dim"],
        heads=cfg["heads"], input_resolution=cfg["input_resolution"],
        width=cfg["width"]).eval()
    _randomize_bn_stats(ref)

    rng = np.random.default_rng(1)
    img = rng.standard_normal(
        (batch, cfg["input_resolution"], cfg["input_resolution"], 3)
    ).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(img).permute(0, 3, 1, 2)).numpy()

    params = state_dict_to_pytree(ref.state_dict())
    out, tokens = jax.jit(
        lambda p, x: clip_resnet_encode(p, x, name=name))(params, img)
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=atol, rtol=1e-4)
    grid = cfg["input_resolution"] // 32
    assert tokens.shape == (batch, grid * grid, cfg["embed_dim"])


class TestModifiedResNetParity:
    def test_tiny_rn_parity(self, clip_base):
        _parity(clip_base, "tiny-rn")

    def test_rn50_full_size_parity(self, clip_base):
        """Full RN50 (3-4-6-3, width 64, 224px, attnpool 32 heads) — the
        advertised entry in models/clip._MODELS actually loads and matches."""
        _parity(clip_base, "RN50", batch=1, atol=5e-4)

    def test_init_shapes_match_torch(self, clip_base):
        cfg = resnet_config("tiny-rn")
        ref = clip_base.ModifiedResNet(
            layers=list(cfg["layers"]), output_dim=cfg["output_dim"],
            heads=cfg["heads"], input_resolution=cfg["input_resolution"],
            width=cfg["width"])
        ours = clip_resnet_init(jax.random.PRNGKey(0), "tiny-rn")
        from qa_tiger_tpu.convert.torch_import import nested_to_flat

        flat = nested_to_flat(ours)
        ref_sd = {k: tuple(v.shape) for k, v in ref.state_dict().items()
                  if "num_batches_tracked" not in k}
        ours_sd = {k: tuple(v.shape) for k, v in flat.items()}
        assert ours_sd == ref_sd

    def test_infer_config_from_rn_state_dict(self, clip_base):
        """convert.clip_import sniffs RN architecture from visual.* keys the
        same way the reference's build_model does (clip_base.py:461-476)."""
        from qa_tiger_tpu.convert.clip_import import infer_clip_config

        cfg = resnet_config("tiny-rn")
        ref = clip_base.ModifiedResNet(
            layers=list(cfg["layers"]), output_dim=cfg["output_dim"],
            heads=cfg["heads"], input_resolution=cfg["input_resolution"],
            width=cfg["width"])
        sd = {f"visual.{k}": v for k, v in ref.state_dict().items()}
        # minimal text keys so the text-side sniffing works
        sd["text_projection"] = torch.zeros(16, 8)
        sd["ln_final.weight"] = torch.zeros(16)
        sd["token_embedding.weight"] = torch.zeros(100, 16)
        sd["positional_embedding"] = torch.zeros(12, 16)
        got = infer_clip_config(sd)
        assert got["vision_kind"] == "resnet"
        assert got["vision_layers"] == cfg["layers"]
        assert got["vision_width"] == cfg["width"]
        assert got["input_resolution"] == cfg["input_resolution"]
        assert got["vision_heads"] == cfg["heads"]
        assert got["vision_output_dim"] == cfg["output_dim"]
