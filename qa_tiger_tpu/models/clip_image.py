"""CLIP ViT image tower in JAX (the frame-feature extractor).

Mirrors the reference's vendored OpenAI CLIP VisionTransformer
(reference: src/models/base/clip_base.py:257-299): patch conv (no bias),
class embedding, positional embedding, ln_pre, pre-LN QuickGELU transformer
(no causal mask), ln_post over ALL tokens, and the forward returns
``(cls @ proj, patch_tokens)`` — the tuple convention the extraction scripts
rely on. Used to produce the [T, 768] per-frame features (ViT-L/14@336px ->
[60, 768], scripts/extract_clip_feat/extract_frames_ViT-L14@336px.py:99-171).

Parameter names mirror the CLIP ``visual.*`` state_dict (conv1.weight in
torch OIHW, class_embedding, positional_embedding, ln_pre, transformer
resblocks, ln_post, proj) for mechanical checkpoint conversion.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models.clip_text import resblock
from qa_tiger_tpu.nn import layer_norm, layer_norm_init

Params = dict

CLIP_VISION_CONFIGS: Dict[str, dict] = {
    "ViT-L/14@336px": dict(input_resolution=336, patch_size=14, width=1024,
                           layers=24, heads=16, output_dim=768),
    "ViT-L/14": dict(input_resolution=224, patch_size=14, width=1024,
                     layers=24, heads=16, output_dim=768),
    "ViT-B/32": dict(input_resolution=224, patch_size=32, width=768,
                     layers=12, heads=12, output_dim=512),
    "ViT-B/16": dict(input_resolution=224, patch_size=16, width=768,
                     layers=12, heads=12, output_dim=512),
}

# CLIP image normalisation stats (ref src/models/clip.py:79-86)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def vision_config(name: str) -> dict:
    cfg = dict(CLIP_VISION_CONFIGS[name])
    cfg["grid"] = cfg["input_resolution"] // cfg["patch_size"]
    return cfg


def clip_vision_init(key: jax.Array, name: str = "ViT-L/14@336px") -> Params:
    cfg = vision_config(name)
    w, layers, p = cfg["width"], cfg["layers"], cfg["patch_size"]
    scale = w ** -0.5
    keys = jax.random.split(key, layers + 4)
    proj_std = scale * ((2 * layers) ** -0.5)
    attn_std = scale
    fc_std = (2 * w) ** -0.5
    resblocks = {}
    for i in range(layers):
        kb = jax.random.split(keys[i], 4)
        resblocks[str(i)] = {
            "attn": {
                "in_proj_weight": attn_std * jax.random.normal(kb[0], (3 * w, w)),
                "in_proj_bias": jnp.zeros((3 * w,)),
                "out_proj": {"weight": proj_std * jax.random.normal(kb[1], (w, w)),
                             "bias": jnp.zeros((w,))},
            },
            "ln_1": layer_norm_init(w),
            "mlp": {
                "c_fc": {"weight": fc_std * jax.random.normal(kb[2], (4 * w, w)),
                         "bias": jnp.zeros((4 * w,))},
                "c_proj": {"weight": proj_std * jax.random.normal(kb[3], (w, 4 * w)),
                           "bias": jnp.zeros((w,))},
            },
            "ln_2": layer_norm_init(w),
        }
    return {
        "conv1": {"weight": scale * jax.random.normal(
            keys[layers], (w, 3, p, p))},  # torch OIHW, bias=False
        "class_embedding": scale * jax.random.normal(keys[layers + 1], (w,)),
        "positional_embedding": scale * jax.random.normal(
            keys[layers + 2], (cfg["grid"] ** 2 + 1, w)),
        "ln_pre": layer_norm_init(w),
        "transformer": {"resblocks": resblocks},
        "ln_post": layer_norm_init(w),
        "proj": scale * jax.random.normal(keys[layers + 3], (w, cfg["output_dim"])),
    }


def clip_vision_encode(params: Params, images: jax.Array, *,
                       name: str = "ViT-L/14@336px"
                       ) -> Tuple[jax.Array, jax.Array]:
    """[B, H, W, 3] (CLIP-normalized) -> (cls_proj [B, out], tokens [B, N, W])."""
    cfg = vision_config(name)
    p = cfg["patch_size"]
    kernel = jnp.transpose(params["conv1"]["weight"], (2, 3, 1, 0))  # HWIO
    x = jax.lax.conv_general_dilated(
        images, kernel, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, gh, gw, w = x.shape
    x = x.reshape(B, gh * gw, w)
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, w)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"]
    x = layer_norm(params["ln_pre"], x)
    for i in range(cfg["layers"]):
        x = resblock(params["transformer"]["resblocks"][str(i)], x,
                     heads=cfg["heads"], mask=None)
    x = layer_norm(params["ln_post"], x)
    cls_proj = jnp.matmul(x[:, 0], params["proj"],
                          preferred_element_type=jnp.float32).astype(x.dtype)
    return cls_proj, x[:, 1:]


def preprocess_frames(frames_uint8: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> CLIP-normalized float32 (resize done host-side
    or upstream; this is the normalize step of the reference _transform)."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
