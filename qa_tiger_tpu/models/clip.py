"""CLIP model surface: named-model table, loader, and contrastive forward.

API-parity with the reference's vendored ``clip.load()`` surface
(reference: src/models/clip.py:30-147): a table of released model names
(with download URLs + SHA256 prefixes for environments with network access),
a loader that materialises JAX text+vision towers from a local ``.pt``
checkpoint (converted via qa_tiger_tpu.convert.clip_import), and the
contrastive ``clip_forward`` producing logits_per_image / logits_per_text
(ref src/models/base/clip_base.py:302-434 CLIP.forward).
"""
from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models.clip_image import clip_vision_encode
from qa_tiger_tpu.models.clip_text import clip_text_encode

# released OpenAI CLIP checkpoints (same table the reference vendors,
# src/models/clip.py:30-44); the URL path segment is the file's SHA256
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models():
    return list(_MODELS)


def download(name: str, root: Optional[str] = None) -> str:
    """Fetch a released checkpoint with SHA256 verification (ref
    src/models/clip.py:47-72). Requires network access; offline environments
    should place the file at ``<root>/<basename>`` manually."""
    if name not in _MODELS:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    url = _MODELS[name]
    root = root or os.path.expanduser("~/.cache/clip")
    os.makedirs(root, exist_ok=True)
    expected_sha = url.split("/")[-2]
    target = Path(root) / url.split("/")[-1]
    if target.exists():
        digest = hashlib.sha256(target.read_bytes()).hexdigest()
        if digest == expected_sha:
            return str(target)
        warnings.warn(f"{target} checksum mismatch; re-downloading")
    urllib.request.urlretrieve(url, target)
    digest = hashlib.sha256(target.read_bytes()).hexdigest()
    if digest != expected_sha:
        raise RuntimeError(f"downloaded {name} has wrong SHA256")
    return str(target)


def load(name_or_path: str, download_root: Optional[str] = None
         ) -> Tuple[dict, dict, dict]:
    """-> (text_params, vision_params, config) for a CLIP model.

    ``name_or_path`` is either a local ``.pt`` file or a released model name
    (downloaded when the environment has network access).
    """
    from qa_tiger_tpu.convert.clip_import import convert_clip_checkpoint

    path = name_or_path
    if not os.path.exists(path):
        path = download(name_or_path, download_root)
    return convert_clip_checkpoint(path)


def clip_forward(text_params: dict, vision_params: dict,
                 images: jax.Array, text: jax.Array, *,
                 encoder_type: str = "ViT-L/14@336px"
                 ) -> Tuple[jax.Array, jax.Array]:
    """Contrastive forward: (logits_per_image, logits_per_text)."""
    if encoder_type.startswith("RN"):
        from qa_tiger_tpu.models.clip_resnet import clip_resnet_encode

        image_features, _ = clip_resnet_encode(vision_params, images,
                                               name=encoder_type)
    else:
        image_features, _ = clip_vision_encode(vision_params, images,
                                               name=encoder_type)
    text_features, _ = clip_text_encode(text_params, text,
                                        encoder_type=encoder_type)
    image_features = image_features / jnp.linalg.norm(
        image_features, axis=-1, keepdims=True)
    text_features = text_features / jnp.linalg.norm(
        text_features, axis=-1, keepdims=True)
    scale = jnp.exp(text_params["logit_scale"])
    logits_per_image = scale * image_features @ text_features.T
    return logits_per_image, logits_per_image.T
