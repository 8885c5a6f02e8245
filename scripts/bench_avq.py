"""Standalone on-chip probe for the fused AVQ train kernels.

Times, on a warm backend (one trivial jit first to absorb the axon
warm-up), at the SHIPPED train shapes (N=2B=64, T=60, S=77, D=512, h=8):
  1. Mosaic compile of the forward kernel alone,
  2. Mosaic compile of the fwd+bwd pair (jax.grad through the custom_vjp),
  3. steady-state runtime of both.

Tile ablation: run under QA_TIGER_AVQ_BWD_TILE=N (read at module import).
This is the compile-cost attribution harness for the train step
(docs/PROFILE.md "cold-compile breakdown") and the 4-vs-6 bwd-tile A/B.
Reference being beaten: /root/reference/src/models/modules.py:159-265.
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--T", type=int, default=60)
    ap.add_argument("--S", type=int, default=77)
    ap.add_argument("--D", type=int, default=512)
    ap.add_argument("--nhead", type=int, default=8)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--jnp", action="store_true",
                    help="time the masked jnp oracle path (XLA, no kernel) "
                         "at the same shapes — calibrates this standalone "
                         "harness against the in-step numbers")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import modules as M
    from qa_tiger_tpu.ops.pallas import avq as AVQ

    dev = jax.devices()[0]
    print(f"# device={dev.platform} AVQ_TILE={AVQ.AVQ_TILE} "
          f"AVQ_BWD_TILE={AVQ.AVQ_BWD_TILE} AVQ_V={AVQ.AVQ_V}", flush=True)

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x @ x)(jnp.ones((256, 256))))
    print(f"# backend warm-up: {time.perf_counter() - t0:.1f}s", flush=True)

    N, T, S, D, h = args.N, args.T, args.S, args.D, args.nhead
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    params = jax.device_put(M.avq_cross_attn_init(ks[0], D), dev)
    src = jax.device_put(jax.random.normal(ks[1], (N, T, D), jnp.float32), dev)
    val = jax.device_put(jax.random.normal(ks[2], (N, T, D), jnp.float32), dev)
    wrd = jax.device_put(jax.random.normal(ks[3], (N, S, D), jnp.float32), dev)
    masks = jax.device_put(
        M.make_avq_dropout_masks(ks[4], N, T, S, D, nhead=h, dropout_p=0.1),
        dev)

    if args.jnp:
        def fwd(s, p):
            out = M.avq_sub_forward_masked(p, s, val, wrd, masks, nhead=h)
            return jnp.sum(out ** 2)
    else:
        def fwd(s, p):
            out = AVQ.fused_avq_train(s, val, wrd, p, masks, h,
                                      AVQ.AVQ_TILE,
                                      None)  # None: kernel on TPU, jnp on CPU
            return jnp.sum(out ** 2)

    t0 = time.perf_counter()
    fwd_c = jax.jit(fwd).lower(src, params).compile()
    t_fwd_c = time.perf_counter() - t0
    print(f"# fwd compile: {t_fwd_c:.1f}s", flush=True)

    np.asarray(fwd_c(src, params))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        r = fwd_c(src, params)
    np.asarray(r)
    fwd_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"# fwd run: {fwd_ms:.3f} ms/step", flush=True)

    if args.fwd_only:
        print('{"metric": "avq_fwd_ms", "value": %.3f, "unit": "ms", '
              '"compile_s": %.1f}' % (fwd_ms, t_fwd_c), flush=True)
        return

    t0 = time.perf_counter()
    bwd_c = jax.jit(jax.grad(fwd, argnums=(0, 1))).lower(src, params).compile()
    t_bwd_c = time.perf_counter() - t0
    print(f"# fwd+bwd compile: {t_bwd_c:.1f}s", flush=True)

    g = bwd_c(src, params)
    np.asarray(jax.tree_util.tree_leaves(g)[0])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        g = bwd_c(src, params)
    np.asarray(jax.tree_util.tree_leaves(g)[0][0, 0, :4])
    bwd_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"# fwd+bwd run: {bwd_ms:.3f} ms/step", flush=True)

    print('{"metric": "avq_train_ms", "value": %.3f, "unit": "ms", '
          '"fwd_ms": %.3f, "fwd_compile_s": %.1f, "bwd_compile_s": %.1f, '
          '"bwd_tile": %d}' % (bwd_ms, fwd_ms, t_fwd_c, t_bwd_c,
                               AVQ.AVQ_BWD_TILE), flush=True)


if __name__ == "__main__":
    main()
