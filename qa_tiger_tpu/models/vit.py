"""timm-style Vision Transformer with optional ToMe token merging, JAX.

The patch-feature extractor in the reference is timm's
``vit_large_patch16_384`` monkey-patched by ToMe (reference:
scripts/extract_ToMe/extract_tome14.py:97-101 — head removed, ``r=[25]*23``,
577 -> 14 tokens; the patched attention adds proportional attention
``attn += size.log()`` and returns ``k.mean(heads)`` as the merge metric,
src/tome/patch/timm.py:91-107; merging happens between attention and MLP,
src/tome/patch/timm.py:39-58).

Here ToMe is not a monkey-patch but a first-class forward mode: because r is
static per layer, every layer's token count is a compile-time constant and
the whole 24-block, progressively-shrinking network jits into ONE XLA
program per batch shape — no recompilation, no dynamic shapes.

Parameter tree mirrors timm state_dict names (cls_token, pos_embed,
patch_embed.proj.{weight,bias} in torch OIHW layout, blocks.N.{norm1, attn.qkv,
attn.proj, norm2, mlp.fc1, mlp.fc2}, norm) so pretrained timm checkpoints
convert losslessly via convert/torch_import.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.nn import layer_norm, layer_norm_init, linear
from qa_tiger_tpu.ops.tome import bipartite_soft_matching, merge_source, merge_wavg, parse_r

Params = dict

VIT_CONFIGS: Dict[str, dict] = {
    # the extraction recipe's model (scripts/extract_ToMe/extract_tome14.py)
    "vit_large_patch16_384": dict(img_size=384, patch_size=16, width=1024,
                                  depth=24, heads=16, ln_eps=1e-6),
    # common timm variants for alternative extraction recipes
    "vit_large_patch16_224": dict(img_size=224, patch_size=16, width=1024,
                                  depth=24, heads=16, ln_eps=1e-6),
    "vit_base_patch16_384": dict(img_size=384, patch_size=16, width=768,
                                 depth=12, heads=12, ln_eps=1e-6),
    "vit_base_patch16_224": dict(img_size=224, patch_size=16, width=768,
                                 depth=12, heads=12, ln_eps=1e-6),
    "vit_base_patch32_224": dict(img_size=224, patch_size=32, width=768,
                                 depth=12, heads=12, ln_eps=1e-6),
    "vit_small_patch16_224": dict(img_size=224, patch_size=16, width=384,
                                  depth=12, heads=6, ln_eps=1e-6),
    "vit_huge_patch14_224": dict(img_size=224, patch_size=14, width=1280,
                                 depth=32, heads=16, ln_eps=1e-6),
}


def vit_config(name: str) -> dict:
    cfg = dict(VIT_CONFIGS[name])
    cfg["grid"] = cfg["img_size"] // cfg["patch_size"]
    cfg["tokens"] = cfg["grid"] ** 2 + 1
    return cfg


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def vit_init(key: jax.Array, name: str = "vit_large_patch16_384") -> Params:
    cfg = vit_config(name)
    w, depth = cfg["width"], cfg["depth"]
    p = cfg["patch_size"]
    keys = jax.random.split(key, depth + 4)
    params: Params = {
        "cls_token": jnp.zeros((1, 1, w)),
        "pos_embed": _trunc_normal(keys[0], (1, cfg["tokens"], w)),
        "patch_embed": {"proj": {
            "weight": _trunc_normal(keys[1], (w, 3, p, p)),  # torch OIHW
            "bias": jnp.zeros((w,)),
        }},
        "blocks": {},
        "norm": layer_norm_init(w),
    }
    for i in range(depth):
        kb = jax.random.split(keys[2 + i], 4)
        params["blocks"][str(i)] = {
            "norm1": layer_norm_init(w),
            "attn": {
                "qkv": {"weight": _trunc_normal(kb[0], (3 * w, w)),
                        "bias": jnp.zeros((3 * w,))},
                "proj": {"weight": _trunc_normal(kb[1], (w, w)),
                         "bias": jnp.zeros((w,))},
            },
            "norm2": layer_norm_init(w),
            "mlp": {
                "fc1": {"weight": _trunc_normal(kb[2], (4 * w, w)),
                        "bias": jnp.zeros((4 * w,))},
                "fc2": {"weight": _trunc_normal(kb[3], (w, 4 * w)),
                        "bias": jnp.zeros((w,))},
            },
        }
    return params


def patch_embed(params: Params, images: jax.Array, patch_size: int
                ) -> jax.Array:
    """[B, H, W, 3] -> [B, grid*grid, width] via strided conv."""
    kernel = jnp.transpose(params["proj"]["weight"], (2, 3, 1, 0))  # HWIO
    x = jax.lax.conv_general_dilated(
        images, kernel, window_strides=(patch_size, patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["proj"]["bias"]
    B, gh, gw, w = x.shape
    return x.reshape(B, gh * gw, w)


def _attention(p: Params, x: jax.Array, heads: int,
               size: Optional[jax.Array], ln_eps: float
               ) -> Tuple[jax.Array, jax.Array]:
    """timm attention + ToMe hooks: proportional attention with token sizes,
    returns (out, metric = k.mean(heads)) (ref src/tome/patch/timm.py:74-107).

    Routed through the heads-in-lanes Pallas kernel on TPU
    (ops/pallas/attention.attention_wide): q/k/v stay [B, N, C] end to end —
    no [B, H, N, hd] transposes or full [B, H, N, N] fp32 logits in HBM —
    and ToMe's ``log(size)`` proportional-attention term rides the kernel's
    per-key bias input. Plain einsum off-TPU (identical numerics)."""
    from qa_tiger_tpu.ops.pallas.attention import attention_wide

    B, N, C = x.shape
    hd = C // heads
    qkv = linear(p["qkv"], x)                        # [B, N, 3C]
    # lanes are [3, heads, hd]-major: q/k/v are contiguous C-lane slices
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    key_bias = jnp.log(size)[:, :, 0] if size is not None else None
    out = attention_wide(q, k, v, None, hd ** -0.5, heads,
                         key_bias=key_bias)
    out = linear(p["proj"], out)
    # k.mean over heads == mean over the [heads, hd] lane blocks
    metric = jnp.mean(k.reshape(B, N, heads, hd), axis=2)  # [B, N, hd]
    return out, metric


def vit_forward(params: Params, images: jax.Array, *,
                name: str = "vit_large_patch16_384",
                tome_r: Optional[Sequence[int]] = None,
                prop_attn: bool = True,
                trace_source: bool = False,
                global_pool: bool = False):
    """Forward pass. Returns dict with:

    - 'tokens': [B, T_final, width] final-norm token states (cls first) —
      with ``tome_r`` this is the merged-token output the extractor saves
      (minus cls, see ``extract_tome14``'s [60, 14, 1024] layout),
    - 'cls': [B, width] class token,
    - 'gap': MAE-style global-pooled embedding when ``global_pool`` — the
      average over non-cls tokens made PROPORTIONAL to merged-token sizes
      ((x*size)[:,1:].sum(1)/T, ref src/tome/patch/mae.py:50-58), run
      through ``fc_norm`` when the checkpoint carries one,
    - 'source': token-provenance matrix when trace_source.

    MAE models (ref src/tome/patch/mae.py) are this function with
    ``global_pool=True, prop_attn=False``. SWAG models
    (ref src/tome/patch/swag.py) are the default timm path after converting
    their nn.MultiheadAttention weights with ``swag_state_dict_to_vit`` —
    the block math (pre-LN, ToMe between attention and MLP, proportional
    attention, k-mean metric) is identical.
    """
    cfg = vit_config(name)
    heads, ln_eps = cfg["heads"], cfg["ln_eps"]
    x = patch_embed(params["patch_embed"], images, cfg["patch_size"])
    n_patches = x.shape[1]  # MAE pools by the ORIGINAL patch count
    cls = jnp.broadcast_to(params["cls_token"],
                           (x.shape[0], 1, x.shape[-1])).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]

    rs = parse_r(cfg["depth"], list(tome_r) if tome_r is not None else 0)
    size = None
    source = None
    for i in range(cfg["depth"]):
        p = params["blocks"][str(i)]
        attn_size = size if prop_attn else None
        h = layer_norm(p["norm1"], x, eps=ln_eps)
        attn_out, metric = _attention(p["attn"], h, heads, attn_size, ln_eps)
        x = x + attn_out
        r = rs[i]
        if r > 0:
            merge, _ = bipartite_soft_matching(metric, r, class_token=True)
            if trace_source:
                source = merge_source(merge, x, source)
            x, size = merge_wavg(merge, x, size)
            # Fence the merged stream. Without this, XLA fuses the
            # gather/scatter merge chain across layers and the axon
            # backend hangs in compile (pure-jnp attention too) or
            # faults the TPU worker once B*N crosses ~120*577 — bisected
            # 2026-08-17: kernel->merge->kernel at B=120 crashes, same
            # chain with a barrier after each merge runs clean. Costs
            # nothing measurable at B=60 (430 f/s ToMe bench unchanged).
            x, size = jax.lax.optimization_barrier((x, size))
        h = layer_norm(p["norm2"], x, eps=ln_eps)
        h = linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], h),
                                                approximate=False))
        x = x + h
    pre_norm = x
    x = layer_norm(params["norm"], x, eps=ln_eps)
    out = {"tokens": x, "cls": x[:, 0], "size": size,
           "tokens_pre_norm": pre_norm}
    if global_pool:
        # MAE forward_features global_pool branch (src/tome/patch/mae.py:
        # 50-61): pool the PRE-norm states; merged tokens contribute in
        # proportion to how many originals they absorbed
        if size is not None:
            gap = (pre_norm * size)[:, 1:, :].sum(axis=1) / n_patches
        else:
            gap = pre_norm[:, 1:, :].mean(axis=1)
        if "fc_norm" in params:
            gap = layer_norm(params["fc_norm"], gap, eps=ln_eps)
        out["gap"] = gap
    if trace_source:
        out["source"] = source
    return out


def swag_state_dict_to_vit(state_dict) -> Params:
    """Convert a SWAG (torchvision-style) ViT state_dict into this module's
    timm-named pytree. SWAG's blocks use nn.MultiheadAttention
    (in_proj_weight/in_proj_bias/out_proj — the same packed-qkv layout as
    timm's attn.qkv/attn.proj) and torchvision MLP indices (mlp.0/mlp.3);
    after renaming, the block math is identical, so the reference's entire
    swag ToMe patch (src/tome/patch/swag.py:23-101) reduces to
    ``vit_forward`` on the converted weights.
    """
    import numpy as np

    from qa_tiger_tpu.convert.torch_import import flat_to_nested

    flat = {}
    for key, value in state_dict.items():
        v = np.asarray(value, dtype=np.float32)
        k = key
        k = k.replace("conv_proj.", "patch_embed.proj.")
        k = k.replace("class_token", "cls_token")
        k = k.replace("encoder.pos_embedding", "pos_embed")
        k = k.replace("encoder.ln.", "norm.")
        if k.startswith("encoder.layers.encoder_layer_"):
            rest = k[len("encoder.layers.encoder_layer_"):]
            idx, _, tail = rest.partition(".")
            tail = (tail
                    .replace("ln_1.", "norm1.")
                    .replace("ln_2.", "norm2.")
                    .replace("self_attention.in_proj_weight", "attn.qkv.weight")
                    .replace("self_attention.in_proj_bias", "attn.qkv.bias")
                    .replace("self_attention.out_proj.", "attn.proj.")
                    .replace("mlp.0.", "mlp.fc1.")
                    .replace("mlp.3.", "mlp.fc2.")
                    .replace("mlp.linear_1.", "mlp.fc1.")
                    .replace("mlp.linear_2.", "mlp.fc2."))
            k = f"blocks.{idx}.{tail}"
        flat[k] = v
    return flat_to_nested(flat)
