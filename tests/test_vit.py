"""Parity: CLIP image tower vs reference clip_base; ToMe-ViT vs a torch
oracle assembled from the reference's merge functions + timm semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import (
    add_reference_to_path,
    load_reference_module,
    reference_available,
)

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()
ref_merge = load_reference_module("src/tome/merge.py", "ref_tome_merge2")

from src.models.base import clip_base as ref_clip  # noqa: E402

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models import clip_image, vit  # noqa: E402

RNG = np.random.default_rng(0)


def to_pytree(module):
    return jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_pytree(module.state_dict()))


class TestClipVision:
    def test_parity_small(self, monkeypatch):
        name = "tiny-vis"
        monkeypatch.setitem(
            clip_image.CLIP_VISION_CONFIGS, name,
            dict(input_resolution=32, patch_size=8, width=64, layers=2,
                 heads=4, output_dim=48))
        ref = ref_clip.VisionTransformer(
            input_resolution=32, patch_size=8, width=64, layers=2, heads=4,
            q_aware_N=-1, output_dim=48).eval()
        params = to_pytree(ref)
        imgs = RNG.standard_normal((2, 3, 32, 32), dtype=np.float32)
        with torch.no_grad():
            t_cls, t_tokens = ref(torch.tensor(imgs))
        j_cls, j_tokens = clip_image.clip_vision_encode(
            params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), name=name)
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(j_tokens), t_tokens.numpy(),
                                   rtol=1e-4, atol=3e-5)


class TorchToMeViT(torch.nn.Module):
    """Oracle: timm-style ViT with the reference's ToMe transform applied
    (proportional attention + k-mean metric + merge between attn and MLP,
    semantics of src/tome/patch/timm.py)."""

    def __init__(self, img=32, patch=8, width=64, depth=3, heads=4):
        super().__init__()
        self.patch = patch
        self.heads = heads
        grid = img // patch
        self.proj = torch.nn.Conv2d(3, width, patch, patch)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, width) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, grid * grid + 1, width) * 0.02)
        self.blocks = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(width, eps=1e-6)
            blk.qkv = torch.nn.Linear(width, width * 3)
            blk.attn_proj = torch.nn.Linear(width, width)
            blk.norm2 = torch.nn.LayerNorm(width, eps=1e-6)
            blk.fc1 = torch.nn.Linear(width, width * 4)
            blk.fc2 = torch.nn.Linear(width * 4, width)
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(width, eps=1e-6)

    def forward(self, x, rs):
        B = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        size = None
        for blk, r in zip(self.blocks, rs):
            h = blk.norm1(x)
            Bn, N, C = h.shape
            qkv = blk.qkv(h).reshape(Bn, N, 3, self.heads, C // self.heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
            if size is not None:
                attn = attn + size.log()[:, None, None, :, 0]
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(Bn, N, C)
            x = x + blk.attn_proj(out)
            metric = k.mean(1)
            if r > 0:
                merge, _ = ref_merge.bipartite_soft_matching(
                    metric, r, class_token=True)
                x, size = ref_merge.merge_wavg(merge, x, size)
            h = blk.norm2(x)
            x = x + blk.fc2(torch.nn.functional.gelu(blk.fc1(h)))
        return self.norm(x)


def _oracle_to_pytree(oracle: TorchToMeViT, depth):
    sd = {
        "cls_token": oracle.cls_token,
        "pos_embed": oracle.pos_embed,
        "patch_embed.proj.weight": oracle.proj.weight,
        "patch_embed.proj.bias": oracle.proj.bias,
        "norm.weight": oracle.norm.weight,
        "norm.bias": oracle.norm.bias,
    }
    for i, blk in enumerate(oracle.blocks):
        sd[f"blocks.{i}.norm1.weight"] = blk.norm1.weight
        sd[f"blocks.{i}.norm1.bias"] = blk.norm1.bias
        sd[f"blocks.{i}.attn.qkv.weight"] = blk.qkv.weight
        sd[f"blocks.{i}.attn.qkv.bias"] = blk.qkv.bias
        sd[f"blocks.{i}.attn.proj.weight"] = blk.attn_proj.weight
        sd[f"blocks.{i}.attn.proj.bias"] = blk.attn_proj.bias
        sd[f"blocks.{i}.norm2.weight"] = blk.norm2.weight
        sd[f"blocks.{i}.norm2.bias"] = blk.norm2.bias
        sd[f"blocks.{i}.mlp.fc1.weight"] = blk.fc1.weight
        sd[f"blocks.{i}.mlp.fc1.bias"] = blk.fc1.bias
        sd[f"blocks.{i}.mlp.fc2.weight"] = blk.fc2.weight
        sd[f"blocks.{i}.mlp.fc2.bias"] = blk.fc2.bias
    return jax.tree_util.tree_map(jnp.asarray, state_dict_to_pytree(sd))


class TestToMeViT:
    @pytest.mark.parametrize("rs", [[0, 0, 0], [3, 3, 3], [5, 5, 5]])
    def test_parity_vs_torch_oracle(self, monkeypatch, rs):
        monkeypatch.setitem(
            vit.VIT_CONFIGS, "tiny-vit",
            dict(img_size=32, patch_size=8, width=64, depth=3, heads=4,
                 ln_eps=1e-6))
        oracle = TorchToMeViT().eval()
        params = _oracle_to_pytree(oracle, 3)
        imgs = RNG.standard_normal((2, 3, 32, 32), dtype=np.float32)
        with torch.no_grad():
            t_out = oracle(torch.tensor(imgs), rs)
        j_out = vit.vit_forward(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                                name="tiny-vit", tome_r=rs)["tokens"]
        assert j_out.shape == t_out.shape
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=2e-4, atol=5e-5)

    def test_full_schedule_shape(self, monkeypatch):
        """577 -> 14 tokens with r=[25]*23, jitted (static shapes)."""
        monkeypatch.setitem(
            vit.VIT_CONFIGS, "sched-vit",
            dict(img_size=384, patch_size=16, width=32, depth=24, heads=4,
                 ln_eps=1e-6))
        params = vit.vit_init(jax.random.PRNGKey(0), "sched-vit")
        imgs = jnp.asarray(
            RNG.standard_normal((1, 384, 384, 3), dtype=np.float32))
        fwd = jax.jit(lambda p, x: vit.vit_forward(
            p, x, name="sched-vit", tome_r=[25] * 23)["tokens"])
        out = fwd(params, imgs)
        assert out.shape == (1, 14, 32)
        assert np.all(np.isfinite(np.asarray(out)))


class TestSwagMaeVariants:
    """SWAG/MAE ToMe patch equivalents (ref src/tome/patch/swag.py, mae.py):
    in JAX these are a weight-layout converter + a pooling mode, because
    vit_forward's block math already matches both patched architectures."""

    def test_swag_tome_attention_parity(self):
        """Reference swag.ToMeAttention (nn.MultiheadAttention layout,
        proportional attention, k-mean metric; swag.py:65-101) vs our
        _attention after the in_proj->qkv renaming."""
        ref_swag = load_reference_module("src/tome/patch/swag.py",
                                         "ref_tome_swag")
        torch.manual_seed(0)
        attn = ref_swag.ToMeAttention(embed_dim=64, num_heads=4).eval()
        x = RNG.standard_normal((2, 7, 64), dtype=np.float32)
        size = np.abs(RNG.standard_normal((2, 7, 1))).astype(np.float32) + 0.5
        with torch.no_grad():
            t_out, t_metric = attn(torch.tensor(x), torch.tensor(size))
        p = {
            "qkv": {"weight": jnp.asarray(attn.in_proj_weight.detach().numpy()),
                    "bias": jnp.asarray(attn.in_proj_bias.detach().numpy())},
            "proj": {"weight": jnp.asarray(attn.out_proj.weight.detach().numpy()),
                     "bias": jnp.asarray(attn.out_proj.bias.detach().numpy())},
        }
        j_out, j_metric = vit._attention(p, jnp.asarray(x), 4,
                                         jnp.asarray(size), 1e-6)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(j_metric), t_metric.numpy(),
                                   rtol=1e-4, atol=3e-5)

    def test_mae_global_pool_formula(self, monkeypatch):
        """gap == the reference's (x*size)[:,1:].sum(1)/T -> fc_norm
        (mae.py:50-61), evaluated in torch on the same states."""
        monkeypatch.setitem(
            vit.VIT_CONFIGS, "tiny-mae",
            dict(img_size=32, patch_size=8, width=64, depth=3, heads=4,
                 ln_eps=1e-6))
        params = vit.vit_init(jax.random.PRNGKey(0), "tiny-mae")
        params["fc_norm"] = {"weight": jnp.asarray(
            RNG.standard_normal(64, dtype=np.float32)),
            "bias": jnp.asarray(RNG.standard_normal(64, dtype=np.float32))}
        imgs = jnp.asarray(RNG.standard_normal((2, 32, 32, 3),
                                               dtype=np.float32))
        out = vit.vit_forward(params, imgs, name="tiny-mae", tome_r=[2, 2, 0],
                              prop_attn=False, global_pool=True)
        x = torch.tensor(np.asarray(out["tokens_pre_norm"]))
        sz = torch.tensor(np.asarray(out["size"]))
        T = 16  # (32/8)^2 original patches
        expected = (x * sz)[:, 1:, :].sum(dim=1) / T
        ln = torch.nn.LayerNorm(64, eps=1e-6)
        with torch.no_grad():
            ln.weight.copy_(torch.tensor(np.asarray(params["fc_norm"]["weight"])))
            ln.bias.copy_(torch.tensor(np.asarray(params["fc_norm"]["bias"])))
            expected = ln(expected)
        np.testing.assert_allclose(np.asarray(out["gap"]), expected.numpy(),
                                   rtol=1e-4, atol=3e-5)
        # unmerged fallback: plain mean over non-cls tokens
        out2 = vit.vit_forward(params, imgs, name="tiny-mae",
                               prop_attn=False, global_pool=True)
        x2 = torch.tensor(np.asarray(out2["tokens_pre_norm"]))
        with torch.no_grad():
            exp2 = ln(x2[:, 1:, :].mean(dim=1))
        np.testing.assert_allclose(np.asarray(out2["gap"]), exp2.numpy(),
                                   rtol=1e-4, atol=3e-5)

    def test_swag_state_dict_converter(self, monkeypatch):
        """torchvision/SWAG-named state_dict -> timm-named pytree accepted
        by vit_forward (structure identical to vit_init's)."""
        monkeypatch.setitem(
            vit.VIT_CONFIGS, "tiny-swag",
            dict(img_size=32, patch_size=8, width=64, depth=2, heads=4,
                 ln_eps=1e-6))
        w, depth, p = 64, 2, 8
        rng = np.random.default_rng(3)
        sd = {
            "class_token": rng.standard_normal((1, 1, w)),
            "conv_proj.weight": rng.standard_normal((w, 3, p, p)),
            "conv_proj.bias": rng.standard_normal(w),
            "encoder.pos_embedding": rng.standard_normal((1, 17, w)),
            "encoder.ln.weight": rng.standard_normal(w),
            "encoder.ln.bias": rng.standard_normal(w),
        }
        for i in range(depth):
            pre = f"encoder.layers.encoder_layer_{i}."
            sd.update({
                pre + "ln_1.weight": rng.standard_normal(w),
                pre + "ln_1.bias": rng.standard_normal(w),
                pre + "self_attention.in_proj_weight":
                    rng.standard_normal((3 * w, w)),
                pre + "self_attention.in_proj_bias": rng.standard_normal(3 * w),
                pre + "self_attention.out_proj.weight":
                    rng.standard_normal((w, w)),
                pre + "self_attention.out_proj.bias": rng.standard_normal(w),
                pre + "ln_2.weight": rng.standard_normal(w),
                pre + "ln_2.bias": rng.standard_normal(w),
                pre + "mlp.0.weight": rng.standard_normal((4 * w, w)),
                pre + "mlp.0.bias": rng.standard_normal(4 * w),
                pre + "mlp.3.weight": rng.standard_normal((w, 4 * w)),
                pre + "mlp.3.bias": rng.standard_normal(w),
            })
        params = vit.swag_state_dict_to_vit(sd)
        want = vit.vit_init(jax.random.PRNGKey(0), "tiny-swag")
        flat_got = jax.tree_util.tree_structure(params)
        flat_want = jax.tree_util.tree_structure(want)
        assert flat_got == flat_want
        out = vit.vit_forward(
            params, jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(
                np.float32)), name="tiny-swag", tome_r=[2, 2])
        assert out["tokens"].shape == (1, 13, w)
        assert np.all(np.isfinite(np.asarray(out["tokens"])))
