"""OpenAI CLIP checkpoint -> qa_tiger_tpu pytrees.

Splits a CLIP state_dict (from the released ``.pt`` archives — TorchScript
or plain — the same files the reference downloads,
src/models/clip.py:30-72,131-147) into:

- the text tower pytree consumed by ``models/clip_text.py`` (the
  ``quest_encoder`` subtree of QA-TIGER checkpoints),
- the vision tower pytree consumed by ``models/clip_image.py``.

fp16 tensors are upcast to fp32 (the reference loads fp32 on CPU,
src/models/clip.py:145-146). Also infers the model shape from the state_dict
like the reference's ``build_model`` shape sniffing
(src/models/base/clip_base.py:461-499).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from qa_tiger_tpu.convert.torch_import import state_dict_to_pytree

TEXT_KEYS = ("transformer.", "token_embedding.", "positional_embedding",
             "ln_final.", "text_projection", "logit_scale")


def load_clip_state_dict(path: str) -> Dict[str, Any]:
    """Read a CLIP .pt file (TorchScript archive or plain state_dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        return model.state_dict()
    except RuntimeError:
        state = torch.load(path, map_location="cpu", weights_only=True)
        return state.get("state_dict", state)


def split_clip_state_dict(state_dict: Dict[str, Any]
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (text_params, vision_params) pytrees."""
    text_flat = {k: v for k, v in state_dict.items()
                 if k.startswith(TEXT_KEYS)}
    vision_flat = {k[len("visual."):]: v for k, v in state_dict.items()
                   if k.startswith("visual.")}
    text = state_dict_to_pytree(text_flat)
    vision = state_dict_to_pytree(vision_flat)
    return text, vision


def infer_clip_config(state_dict: Dict[str, Any]) -> dict:
    """Shape-sniff the architecture (text + vision) from a state_dict."""
    def shape(key):
        return tuple(np.shape(state_dict[key]))

    embed_dim = shape("text_projection")[1]
    text_width = shape("ln_final.weight")[0]
    text_layers = len({k.split(".")[2] for k in state_dict
                       if k.startswith("transformer.resblocks.")})
    cfg = dict(embed_dim=embed_dim, text_width=text_width,
               text_layers=text_layers, text_heads=text_width // 64,
               vocab_size=shape("token_embedding.weight")[0],
               context_length=shape("positional_embedding")[0])
    if "visual.layer1.0.conv1.weight" in state_dict:
        # ModifiedResNet tower (reference clip_base.py:461-476 sniffs the
        # same keys): stem conv1 out-channels = width//2, attnpool pos embed
        # gives the 1/32-scale spatial grid
        vision_width = shape("visual.conv1.weight")[0] * 2
        counts = tuple(
            len({k.split(".")[2] for k in state_dict
                 if k.startswith(f"visual.layer{b}.")}) for b in range(1, 5))
        grid_sq = shape("visual.attnpool.positional_embedding")[0] - 1
        grid = int(round(grid_sq ** 0.5))
        cfg.update(vision_kind="resnet", vision_width=vision_width,
                   vision_layers=counts, input_resolution=grid * 32,
                   vision_heads=vision_width * 32 // 64,
                   vision_output_dim=shape("visual.attnpool.c_proj.weight")[0])
    elif "visual.conv1.weight" in state_dict:
        conv = shape("visual.conv1.weight")
        vision_width = conv[0]
        patch = conv[-1]
        grid_sq = shape("visual.positional_embedding")[0] - 1
        grid = int(round(grid_sq ** 0.5))
        cfg.update(vision_kind="vit", vision_width=vision_width,
                   patch_size=patch, input_resolution=grid * patch,
                   vision_layers=len({k.split(".")[3] for k in state_dict
                                      if k.startswith("visual.transformer.resblocks.")}),
                   vision_heads=vision_width // 64)
    return cfg


def convert_clip_checkpoint(path: str) -> Tuple[dict, dict, dict]:
    """-> (text_params, vision_params, inferred_config)."""
    sd = load_clip_state_dict(path)
    cfg = infer_clip_config(sd)
    text, vision = split_clip_state_dict(sd)
    return text, vision, cfg
