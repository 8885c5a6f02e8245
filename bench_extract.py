"""Feature-extraction throughput benchmark (frames/sec on-device).

Measures the two vision extraction towers at full published size — CLIP
ViT-L/14@336px frame features and the ToMe'd ViT-L/16-384 patch features
(577 -> 14 tokens) — plus VGGish audio seconds/sec, on the local accelerator
in bf16. Prints one JSON line per stage. (The driver's headline bench is
bench.py; this records the BASELINE "feature-extraction frames/sec" metric.)
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

FRAMES = 60  # one video per call, like the extraction drivers


def main():
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import clip_image, vit
    from qa_tiger_tpu.pipeline.vggish import vggish_embed_seconds, vggish_init

    rng = np.random.default_rng(0)
    results = {}

    def timed(fn, *args, items):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 5)
        return items / best

    # CLIP ViT-L/14@336px frame features
    cp = clip_image.clip_vision_init(jax.random.PRNGKey(0), "ViT-L/14@336px")
    cp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, cp)
    frames336 = jnp.asarray(
        rng.standard_normal((FRAMES, 336, 336, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    clip_fn = jax.jit(lambda p, x: clip_image.clip_vision_encode(
        p, x, name="ViT-L/14@336px")[0])
    results["clip_vitl14_336_frames_per_sec"] = timed(
        lambda p=cp, x=frames336: clip_fn(p, x), items=FRAMES)

    # ToMe ViT-L/16-384 patch features (577 -> 14)
    tp = vit.vit_init(jax.random.PRNGKey(1), "vit_large_patch16_384")
    tp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tp)
    frames384 = jnp.asarray(
        rng.standard_normal((FRAMES, 384, 384, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    tome_fn = jax.jit(lambda p, x: vit.vit_forward(
        p, x, name="vit_large_patch16_384", tome_r=[25] * 23)["tokens"])
    results["tome_vitl16_384_frames_per_sec"] = timed(
        lambda p=tp, x=frames384: tome_fn(p, x), items=FRAMES)

    # VGGish audio embedding
    vp = vggish_init(jax.random.PRNGKey(2))
    seconds = jnp.asarray(
        (rng.standard_normal((FRAMES, 16000)) * 0.1).astype(np.float32))
    results["vggish_audio_seconds_per_sec"] = timed(
        lambda p=vp, x=seconds: vggish_embed_seconds(p, x), items=FRAMES)

    for metric, value in results.items():
        print(json.dumps({"metric": metric, "value": round(value, 2),
                          "unit": metric.split("_")[-3] + "/s"}))


if __name__ == "__main__":
    main()
