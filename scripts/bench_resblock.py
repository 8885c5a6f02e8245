#!/usr/bin/env python
"""Standalone A/B micro-bench for the fused text-tower attention-half
kernel (ops/pallas/resblock.fused_attn_ln2) at shipped dims.

Serializes ITERS kernel applications through one lax.scan (each iteration's
y feeds the next x), so a single dispatch yields honest per-iteration
device time even on the axon backend, whose block_until_ready can return
early (CLAUDE.md) — timing ends at np.asarray of a reduced scalar.

Ablate rows-per-grid-step with the env knob:
    QA_TIGER_ATTN_R=4 python scripts/bench_resblock.py   # pre-round-4 size
    QA_TIGER_ATTN_R=8 python scripts/bench_resblock.py   # default
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=77)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--fn", default="attn_ln2",
                    choices=["attn_ln2", "attn_half"],
                    help="attn_half skips the fused ln_2 output (60 vs "
                         "90 MB HBM per layer at B=256) — the A/B that "
                         "prices the kernel's HBM share")
    args = ap.parse_args()

    from qa_tiger_tpu.models.clip_text import resblock_init
    from qa_tiger_tpu.ops.pallas import resblock as R

    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        resblock_init(key, args.width))
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.seq, args.width),
        jnp.bfloat16)
    mask = jnp.triu(jnp.full((args.seq, args.seq), -jnp.inf, jnp.float32), 1)

    @jax.jit
    def run(x0):
        def body(carry, _):
            if args.fn == "attn_half":
                return R.fused_attn_half(
                    carry, params, mask, args.heads, False), ()
            y, h2 = R.fused_attn_ln2(carry, params, mask, args.heads, False)
            # fold h2 in so neither output is dead code
            return (y + 0.0 * h2).astype(carry.dtype), ()

        y, _ = jax.lax.scan(body, x0, None, length=args.iters)
        return jnp.sum(y.astype(jnp.float32))

    x = jax.device_put(x)
    t0 = time.perf_counter()
    np.asarray(run(x))  # compile + first run
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    per_iter_ms = best / args.iters * 1e3
    print(json.dumps({
        "metric": f"fused_{args.fn}_ms_per_layer",
        "value": round(per_iter_ms, 3),
        "unit": "ms",
        "B": args.batch, "S": args.seq, "W": args.width,
        "attn_r": R.ATTN_R,
        "attn_v": R.ATTN_V, "attn_ablate": R.ATTN_ABLATE,
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
