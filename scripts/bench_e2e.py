#!/usr/bin/env python
"""End-to-end raw-media throughput (BASELINE config 5): pixels+PCM+tokens ->
answer logits in ONE jitted graph, at full tower sizes.

Measures the on-chip compute path of pipeline/e2e.e2e_forward — CLIP-L/14@336
frame tower + ToMe ViT-L/16-384 (577->14) patch tower + log-mel+VGGish audio
frontend + frozen CLIP-L text tower + QA-TIGER fusion — for B videos of T
1-second frames each. The reference has no such configuration at all: it is
a two-stage offline system (extract .npy, then train/test); this graph is the
TPU-native replacement.

Inputs are generated ON DEVICE: the axon host<->TPU tunnel moves ~25 MB/s, so
pushing raw pixel buffers through it would measure the tunnel, not the
machine (production feeds ffmpeg output from local hosts). Throughput does
not depend on pixel values.

Prints ONE JSON line: videos/sec plus the per-stage-relevant derived numbers
(media-seconds per wall-second = realtime factor, qa-pairs/sec at one
question per video).

Usage: python scripts/bench_e2e.py [--batch 2] [--frames 60] [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SR = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from qa_tiger_tpu.models.qa_tiger import qa_tiger_config
    from qa_tiger_tpu.pipeline.e2e import e2e_config, e2e_forward, e2e_init

    B, T = args.batch, args.frames
    model_cfg = qa_tiger_config(
        d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
        topK=7, num_experts=7, num_labels=42, encoder_type="ViT-L/14@336px")
    cfg = e2e_config(model_cfg)
    params = e2e_init(jax.random.PRNGKey(0), cfg)
    dtype = jnp.dtype(args.dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    @jax.jit
    def run(params, key, tokens):
        kc, kt, ka = jax.random.split(key, 3)
        # already-normalized pixel tensors, the contract of encode_media
        clip_frames = jax.random.normal(kc, (B, T, 336, 336, 3), dtype)
        tome_frames = jax.random.normal(kt, (B, T, 384, 384, 3), dtype)
        audio_pcm = 0.1 * jax.random.normal(ka, (B, T, SR), jnp.float32)
        return e2e_forward(params, clip_frames, tome_frames, audio_pcm,
                           tokens, cfg)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 49406, (B, 77)), jnp.int64)
    key = jax.random.PRNGKey(7)
    np.asarray(run(params, key, tokens))  # compile + warmup; asarray forces
    np.asarray(run(params, key, tokens))  # full materialization (CLAUDE.md)
    rates = []
    for rep in range(args.repeats):
        start = time.perf_counter()
        for i in range(args.iters):
            out = run(params, jax.random.fold_in(key, i), tokens)
        np.asarray(out)
        rates.append(B * args.iters / (time.perf_counter() - start))
    vps = float(np.median(rates))
    print(json.dumps({
        "metric": "e2e_raw_media_videos_per_sec",
        "value": round(vps, 3),
        "unit": "videos/s",
        "frames_per_video": T,
        "realtime_factor": round(vps * T, 1),  # media-seconds per second
        "qa_pairs_per_sec": round(vps, 3),
    }))


if __name__ == "__main__":
    main()
