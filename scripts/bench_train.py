#!/usr/bin/env python
"""Train-step throughput at the reference recipe (batch 32, fp32, Adam).

Times the full jitted SPMD train step — forward (with dropout), CE loss,
backward, two-group-LR Adam update — through AVQARunner exactly as
src/train.py drives it, on synthetic batches with the shipped feature shapes.
The reference's counterpart is its per-batch Process Time log
(src/trainutils.py:293-309) around loss.backward()/optimizer.step().

Prints ONE JSON line: train steps/sec and the derived qa-pairs/sec.

Usage: python scripts/bench_train.py [--batch 32] [--accum 1] [--iters 20]
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

T, P = 60, 14


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cache-qst", action="store_true",
                    help="opt-in question-feature cache "
                         "(hyper_params.cache_qst_features): the frozen text "
                         "tower is precomputed once; the step gathers rows")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="opt-in multi-step dispatch "
                         "(hyper_params.steps_per_dispatch): K steps ride "
                         "ONE jit call via lax.scan, amortizing the "
                         "per-dispatch host cost (~3.5 ms on this tunneled "
                         "backend)")
    ap.add_argument("--train-dtype", default="",
                    help="opt-in mixed precision, e.g. bfloat16 (fp32 "
                         "master weights; bf16 compute streams)")
    ap.add_argument("--trace", default="", help="capture a jax.profiler "
                    "device trace of 3 warm steps into this dir (summarize "
                    "with scripts/trace_summary.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from qa_tiger_tpu.models.qa_tiger import (
        FROZEN_PREFIXES,
        qa_tiger_config,
        qa_tiger_forward,
        qa_tiger_init,
    )
    from qa_tiger_tpu.parallel import make_mesh
    from qa_tiger_tpu.training.loop import AVQARunner
    from qa_tiger_tpu.utils import Box

    B = args.batch
    cfg = Box(dict(
        type="qa-tiger", debug=False, log_interval=1000, epochs=1,
        hyper_params=dict(
            model=dict(), optim=dict(lr=1e-4, betas=(0.95, 0.999),
                                     weight_decay=0, encoder_lr=None,
                                     grad_accum=args.accum),
            sched=dict(name="StepLR", step_size=8, gamma=0.1),
        ),
    ))
    if args.train_dtype:
        cfg.hyper_params.train_dtype = args.train_dtype
    model_cfg = qa_tiger_config(
        d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
        topK=7, num_experts=7, num_labels=42, encoder_type="ViT-L/14@336px")
    print("# building runner...", file=sys.stderr, flush=True)
    runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                        FROZEN_PREFIXES, mesh=make_mesh(), seed=0)
    print("# runner ready", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    host_batch = {
        "quest": rng.integers(1, 49406, (B, 77)).astype(np.int64),
        "audio": rng.standard_normal((B, T, 128)).astype(np.float32),
        "video": rng.standard_normal((B, T, 768)).astype(np.float32),
        "patch": rng.standard_normal((B, T, P, 1024)).astype(np.float32),
        "label": rng.integers(0, 42, B).astype(np.int32),
        "qtype_label": rng.integers(0, 9, B).astype(np.int32),
        "valid": np.ones(B, bool),
    }
    lr = jnp.float32(1e-4)
    # transfer the batch ONCE: this axon dev tunnel moves ~25 MB/s, so a
    # per-step host->device copy of the ~117 MB batch (patch alone is
    # [32,60,14,1024]f32 = 110 MB) would measure the tunnel (9 s/step), not
    # the machine. Real TPU hosts feed over PCIe/DMA at GB/s; the train step
    # itself no longer donates batch buffers, so reuse is safe.
    if args.cache_qst:
        # one cache row per batch row; the per-step [B,77,768]bf16 gather
        # (~3.8 MB of HBM reads, well under 0.05 ms) rides in _device_batch
        runner.build_question_cache_from_tokens(host_batch["quest"], "bench")
        runner._active_qst_cache = runner._qst_caches["bench"]
        host_batch["ds_idx"] = np.arange(B, dtype=np.int32)
    dev_batch = runner._device_batch(host_batch)

    spd = max(args.steps_per_dispatch, 1)
    if spd > 1:
        # K steps per jit call (AVQARunner._multi_step_impl): the window
        # reuses the same device batch K times — identical device load per
        # step, one dispatch per window
        window = tuple(dev_batch for _ in range(spd))

        def step(i):
            (runner.trainable, runner.opt_state, _,
             losses) = runner._train_multi(
                runner.trainable, runner.frozen, runner.opt_state, window,
                lr, jax.random.PRNGKey(i))
            return losses
    else:
        def step(i):
            runner.trainable, runner.opt_state, losses = runner._train_step(
                runner.trainable, runner.frozen, runner.opt_state, dev_batch,
                lr, jax.random.PRNGKey(i))
            return losses

    def force(losses):
        # force full materialization (block_until_ready can return early on
        # the tunneled backend); loss scalars are tiny host transfers
        float(np.asarray(losses["total_loss"]).ravel()[-1])

    t0 = time.perf_counter()
    force(step(0))
    print("# compile+first step: %.1fs" % (time.perf_counter() - t0),
          file=sys.stderr, flush=True)
    for i in range(3):
        force(step(i))
    print("# warmup done", file=sys.stderr, flush=True)
    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                losses = step(1000 + i)
            force(losses)
        print(f"# trace written to {args.trace}", file=sys.stderr, flush=True)
    rates = []
    for rep in range(args.repeats):
        start = time.perf_counter()
        for i in range(args.iters):
            losses = step(100 * rep + i)
        force(losses)
        dt = time.perf_counter() - start
        rates.append(args.iters * spd / dt)
    sps = float(np.median(rates))
    print(json.dumps({
        "metric": "train_steps_per_sec_b%d%s%s%s%s" % (
            B, f"_accum{args.accum}" if args.accum > 1 else "",
            f"_{args.train_dtype}" if args.train_dtype else "",
            "_cacheqst" if args.cache_qst else "",
            f"_spd{spd}" if spd > 1 else ""),
        "value": round(sps, 3),
        "unit": "steps/s",
        "qa_pairs_per_sec": round(sps * B, 2),
        "step_ms": round(1e3 / sps, 2),
    }))


if __name__ == "__main__":
    main()
