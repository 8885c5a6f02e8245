"""CLIP text tower in JAX (the frozen question encoder).

Re-implements the text half of OpenAI CLIP as used by the reference's
``CLIP_TEncoder`` (reference: src/models/encoders.py:7-37 and
src/models/base/clip_base.py:186-254): token embedding + positional embedding,
a pre-LN causal transformer with QuickGELU MLPs, ln_final, and EOT pooling via
``argmax(token_ids)`` — the EOT token has the highest BPE id (49407), so the
argmax-over-ids trick selects the EOT position. That quirk is intentional and
kept (SURVEY.md §7 hard part #4).

Parameter pytree mirrors the torch state_dict of ``CLIP_TEncoder`` so the
published ``best.pt`` (which embeds the frozen text tower under
``quest_encoder.*``) converts directly.

Weights are frozen in training (requires_grad=False in the reference,
src/models/net.py:47); we wrap the forward in stop_gradient and mask the
optimizer (see training/optim.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.nn import layer_norm, layer_norm_init, linear, mha_init, quick_gelu

Params = dict

# context_length/vocab are shared across OpenAI CLIP releases; width/heads/
# layers/embed_dim of the *text* tower per visual variant
# (shape-sniffed by the reference's build_model, src/models/base/clip_base.py:461-499).
CLIP_TEXT_CONFIGS: Dict[str, dict] = {
    "ViT-L/14@336px": dict(width=768, heads=12, layers=12, embed_dim=768),
    "ViT-L/14": dict(width=768, heads=12, layers=12, embed_dim=768),
    "ViT-B/32": dict(width=512, heads=8, layers=12, embed_dim=512),
    "ViT-B/16": dict(width=512, heads=8, layers=12, embed_dim=512),
    "RN50": dict(width=512, heads=8, layers=12, embed_dim=1024),
}
CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


def text_config(encoder_type: str) -> dict:
    if encoder_type not in CLIP_TEXT_CONFIGS:
        raise KeyError(f"unknown CLIP encoder type {encoder_type!r}; "
                       f"known: {sorted(CLIP_TEXT_CONFIGS)}")
    cfg = dict(CLIP_TEXT_CONFIGS[encoder_type])
    cfg["context_length"] = CONTEXT_LENGTH
    cfg["vocab_size"] = VOCAB_SIZE
    return cfg


def resblock_init(key: jax.Array, width: int) -> Params:
    """One pre-LN transformer block ('attn', 'ln_1', 'mlp.c_fc/c_proj', 'ln_2').

    Init follows CLIP's initialize_parameters scaling: attn in_proj std
    width^-0.5, out_proj std (width^-0.5)/sqrt(2*layers) is applied by the
    caller via proj_std; fc std (2*width)^-0.5.
    """
    k_attn, k_fc, k_proj = jax.random.split(key, 3)
    attn = mha_init(k_attn, width)
    return {
        "attn": attn,
        "ln_1": layer_norm_init(width),
        "mlp": {
            "c_fc": {
                "weight": jnp.zeros((4 * width, width)),
                "bias": jnp.zeros((4 * width,)),
            },
            "c_proj": {
                "weight": jnp.zeros((width, 4 * width)),
                "bias": jnp.zeros((width,)),
            },
        },
        "ln_2": layer_norm_init(width),
    }


def clip_text_init(key: jax.Array, encoder_type: str = "ViT-L/14@336px"
                   ) -> Params:
    """Random init following CLIP's initialize_parameters statistics.

    Real use loads converted pretrained weights; random init exists for tests
    and from-scratch experiments.
    """
    cfg = text_config(encoder_type)
    width, layers = cfg["width"], cfg["layers"]
    keys = jax.random.split(key, layers + 3)

    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5

    resblocks = {}
    for i in range(layers):
        kb = jax.random.split(keys[i], 4)
        block = resblock_init(keys[i], width)
        block["attn"]["in_proj_weight"] = attn_std * jax.random.normal(
            kb[0], (3 * width, width))
        block["attn"]["out_proj"]["weight"] = proj_std * jax.random.normal(
            kb[1], (width, width))
        block["mlp"]["c_fc"]["weight"] = fc_std * jax.random.normal(
            kb[2], (4 * width, width))
        block["mlp"]["c_proj"]["weight"] = proj_std * jax.random.normal(
            kb[3], (width, 4 * width))
        resblocks[str(i)] = block

    return {
        "token_embedding": {
            "weight": 0.02 * jax.random.normal(
                keys[layers], (cfg["vocab_size"], width))
        },
        "positional_embedding": 0.01 * jax.random.normal(
            keys[layers + 1], (cfg["context_length"], width)),
        "transformer": {"resblocks": resblocks},
        "ln_final": layer_norm_init(width),
        "text_projection": (width ** -0.5) * jax.random.normal(
            keys[layers + 2], (width, cfg["embed_dim"])),
        "logit_scale": jnp.asarray(2.6592, jnp.float32),
    }


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive upper-triangular -inf mask (ref clip_base.py build_attention_mask)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(mask, k=1)


def resblock(params: Params, x: jax.Array, *, heads: int,
             mask: Optional[jax.Array]) -> jax.Array:
    """One pre-LN block.

    Attention half (ln_1 + qkv + heads-in-lanes attention + out_proj +
    residual) runs as ONE Pallas kernel on TPU at g=1
    (ops/pallas/resblock.fused_attn_half) — it removes the per-layer
    LayerNorm-chain HBM round trips the round-2 device traces flagged. The
    MLP half stays with XLA, whose own fusion measured FASTER than the
    fused MLP kernel (ops/pallas/resblock.py docstring has the v5e
    numbers). Off-TPU both halves fall back to the jnp formulation."""
    from qa_tiger_tpu.ops.pallas.resblock import fused_attn_ln2

    x, h = fused_attn_ln2(x, params, mask, heads, None)
    h = linear(params["mlp"]["c_fc"], h)
    h = quick_gelu(h)
    h = linear(params["mlp"]["c_proj"], h)
    return x + h


def clip_text_encode(params: Params, text: jax.Array, *,
                     encoder_type: str = "ViT-L/14@336px",
                     ) -> Tuple[jax.Array, jax.Array]:
    """Encode token ids [B, L] -> (pooled [B, embed_dim], words [B, L, width]).

    Mirrors CLIP_TEncoder.forward (ref src/models/encoders.py:30-37): the
    positional embedding is sliced to the input length; ``words`` is the
    ln_final'd sequence *before* text_projection.
    """
    cfg = text_config(encoder_type)
    L = text.shape[1]
    x = params["token_embedding"]["weight"][text]            # [B, L, W]
    x = x + params["positional_embedding"][:L]
    mask = causal_mask(L, dtype=x.dtype)
    for i in range(cfg["layers"]):
        x = resblock(params["transformer"]["resblocks"][str(i)], x,
                     heads=cfg["heads"], mask=mask)
    x = layer_norm(params["ln_final"], x)
    eot_idx = jnp.argmax(text, axis=-1)                      # EOT has max BPE id
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    pooled = jnp.matmul(pooled, params["text_projection"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
    return pooled, x
