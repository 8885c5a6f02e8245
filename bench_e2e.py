"""End-to-end raw-media benchmark (BASELINE config 5): raw frames + PCM ->
answer logits in ONE jitted graph, at full published tower sizes.

Per video: 60 CLIP frames (336px, ViT-L/14), 60 ToMe frames (384px,
ViT-L/16, 577 -> 14 tokens), 60 s of 16 kHz audio through log-mel + VGGish,
one tokenized question, and the full QA-TIGER fusion — the whole chain the
reference runs as offline extraction scripts + a separate model pass.

Prints one JSON line: videos/sec (and the derived qa/s at 1 question/video).
ffmpeg demux stays host-side and is NOT included (identical cost in both
systems; the reference additionally pays .npy round trips that this number
charitably excludes).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

B, T = 2, 60
EVAL_DTYPE = "bfloat16"
ITERS, REPEATS = 3, 3


def main():
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models.qa_tiger import qa_tiger_config
    from qa_tiger_tpu.pipeline.e2e import e2e_config, e2e_forward, e2e_init

    model_cfg = qa_tiger_config(
        d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
        topK=7, num_experts=7, num_labels=42, encoder_type="ViT-L/14@336px")
    cfg = e2e_config(model_cfg)
    params = e2e_init(jax.random.PRNGKey(0), cfg)
    dtype = jnp.dtype(EVAL_DTYPE)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    rng = np.random.default_rng(0)
    clip_frames = jnp.asarray(
        rng.standard_normal((B, T, 336, 336, 3)), dtype)
    tome_frames = jnp.asarray(
        rng.standard_normal((B, T, 384, 384, 3)), dtype)
    audio_pcm = jnp.asarray(
        rng.uniform(-1, 1, (B, T, 16000)).astype(np.float32))
    quest = jnp.asarray(rng.integers(1, 49406, (B, 77)).astype(np.int64))

    fwd = jax.jit(lambda p, c, t, a, q: e2e_forward(p, c, t, a, q, cfg))
    np.asarray(fwd(params, clip_frames, tome_frames, audio_pcm, quest))
    np.asarray(fwd(params, clip_frames, tome_frames, audio_pcm, quest))
    rates = []
    for _ in range(REPEATS):
        start = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(params, clip_frames, tome_frames, audio_pcm, quest)
        np.asarray(out)
        rates.append(B * ITERS / (time.perf_counter() - start))
    vps = float(np.median(rates))
    print(json.dumps({
        "metric": "e2e_raw_media_videos_per_sec_per_chip",
        "value": round(vps, 3),
        "unit": "videos/s",
        "detail": "60 frames@336 CLIP-L + 60 frames@384 ToMe-ViT-L + 60s "
                  "VGGish audio + QA-TIGER fusion, bf16, one jitted graph",
    }))


if __name__ == "__main__":
    main()
