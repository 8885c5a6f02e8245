#!/usr/bin/env python
"""Per-stage timing of the shipped QA-TIGER eval graph on the local chip.

Times each stage as its own jitted function (inputs pre-staged on device,
output forced to host via a small reduction — block_until_ready can return
early on the tunneled backend). Also attempts a jax.profiler trace.

Usage: python scripts/profile_stages.py [--batch 256] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

T, P = 60, 14


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax_sum = _force(out)
    for _ in range(2):
        _force(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - start) / iters * 1e3
    print(f"{name:>28}: {dt:8.2f} ms")
    return dt


def _force(out):
    import jax.numpy as jnp

    leaves = [x for x in __import__("jax").tree_util.tree_leaves(out)
              if hasattr(x, "sum")]
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import modules as M
    from qa_tiger_tpu.models.clip_text import clip_text_encode
    from qa_tiger_tpu.models.qa_tiger import (
        qa_tiger_config,
        qa_tiger_forward,
        qa_tiger_init,
    )
    from qa_tiger_tpu.nn import linear

    B = args.batch
    dtype = jnp.dtype(args.dtype)
    cfg = qa_tiger_config(
        d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
        topK=7, num_experts=7, num_labels=42, encoder_type="ViT-L/14@336px")
    params = qa_tiger_init(jax.random.PRNGKey(0), cfg)
    cast = lambda a: (a.astype(dtype)  # noqa: E731
                      if jnp.issubdtype(a.dtype, jnp.floating) else a)
    params = jax.tree_util.tree_map(cast, params)
    rng = np.random.default_rng(0)
    batch = {
        "quest": jnp.asarray(rng.integers(1, 49406, (B, 77)).astype(np.int64)),
        "audio": jnp.asarray(rng.standard_normal((B, T, 128)), dtype),
        "video": jnp.asarray(rng.standard_normal((B, T, 768)), dtype),
        "patch": jnp.asarray(rng.standard_normal((B, T, P, 1024)), dtype),
    }
    d = cfg["d_model"]
    nhead = cfg["nhead"]

    total = timed("FULL forward", jax.jit(
        lambda p, b: qa_tiger_forward(p, b, cfg, train=False)["out"]),
        params, batch)

    t_text = timed("text tower", jax.jit(
        lambda p, q: clip_text_encode(p, q, encoder_type=cfg["encoder_type"])),
        params["quest_encoder"], batch["quest"])

    # staged intermediates for isolated stage timing
    @jax.jit
    def stage_inputs(p, b):
        quest, words = clip_text_encode(
            p["quest_encoder"], b["quest"], encoder_type=cfg["encoder_type"])
        audio = M.projection(p["audio_proj"], b["audio"])
        video = M.projection(p["video_proj"], b["video"])
        patch = M.projection(p["patch_proj"], b["patch"])
        words = M.projection(p["words_proj"], words)
        quest = M.projection(p["quest_proj"], quest)
        return quest, words, audio, video, patch

    quest, words, audio, video, patch = stage_inputs(params, batch)
    quest, words, audio, video, patch = jax.tree_util.tree_map(
        jnp.asarray, (quest, words, audio, video, patch))

    timed("projections(all)", stage_inputs, params, batch)
    av = jax.jit(lambda p, a, v, w: M.avq_cross_attn(
        p["crs_attn"], a, v, w, nhead=nhead, dropout_p=0.1, train=False))
    timed("avq_cross_attn", av, params, audio, video, words)
    a2, v2 = jax.tree_util.tree_map(jnp.asarray, av(params, audio, video, words))

    ps = jax.jit(lambda p, pt, a, v: M.patch_selecter(
        p["patch_selecter"], pt, a, v, nhead=nhead, dropout_p=0.1,
        train=False))
    timed("patch_selecter", ps, params, patch, a2, v2)
    pair = jax.tree_util.tree_map(jnp.asarray, ps(params, patch, a2, v2))

    tm_a = jax.jit(lambda p, q, a: M.temp_moe(
        p["at_aggregator"], q, a, None, nhead=nhead, topK=cfg["topK"],
        n_experts=cfg["num_experts"], sigma=cfg["sigma"], train=False,
        gather_mode=cfg["gather_mode"], use_fused=True))
    timed("temp_moe(audio)", tm_a, params, quest, a2)
    tm_v = jax.jit(lambda p, q, v, s0, s1: M.temp_moe(
        p["vt_aggregator"], q, v, [s0, s1], nhead=nhead, topK=cfg["topK"],
        n_experts=cfg["num_experts"], sigma=cfg["sigma"], train=False,
        gather_mode=cfg["gather_mode"], use_fused=True))
    timed("temp_moe(visual,2str)", tm_v, params, quest, v2, pair[0], pair[1])

    a_g = jax.tree_util.tree_map(jnp.asarray, tm_a(params, quest, a2))
    apg, vpg = jax.tree_util.tree_map(
        jnp.asarray, tm_v(params, quest, v2, pair[0], pair[1]))

    qg = jax.jit(lambda p, q, x, y: linear(p["head"], jax.nn.relu(
        M.qst_grounding(p["quest_grounding"], q,
                        [M.qst_grounding(p["quest_grounding"], q, [x, y],
                                         nhead=nhead, dropout_p=0.1,
                                         train=False)[:, None, :], y],
                        nhead=nhead, dropout_p=0.1, train=False))))
    timed("grounding x2 + head", qg, params, quest, apg, vpg)

    print(f"{'SUM of stages vs full':>28}: full={total:.2f} ms")

    if args.trace:
        try:
            fwd = jax.jit(
                lambda p, b: qa_tiger_forward(p, b, cfg, train=False)["out"])
            _force(fwd(params, batch))  # compile outside the trace
            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    out = fwd(params, batch)
                _force(out)
            print(f"trace written to {args.trace}")
        except Exception as exc:
            print(f"trace failed: {exc}")


if __name__ == "__main__":
    main()
