"""On-chip Pallas kernel smoke: every kernel, REAL Mosaic lowering, vs oracle.

The interpret-mode parity suites (tests/test_pallas_*.py) pin the kernel math
exactly on CPU, but a libtpu/Mosaic roll can break the real lowering without
touching the math (exactly what round-1's MULTICHIP artifact hit). This script
runs each kernel non-interpret at small shapes on the actual chip and compares
against its jnp oracle computed on the same device, so a lowering regression
surfaces as a NAMED failure here instead of a mystery in bench.py.

Run:  python scripts/tpu_smoke.py            (< 5 min incl. Mosaic compiles)
      python scripts/tpu_smoke.py --skip-train-bwd   (fastest, fwd-only)

Exit 0 = all kernels green; 1 = failures (listed); 2 = no TPU visible.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

# the oracle is the same jnp math the interpret-mode tests pin; on-chip both
# sides ride the MXU (fp32 dots default to bf16-pass precision), so agreement
# is bf16-accumulation-level, not fp32-exact
RTOL, ATOL = 2e-2, 2e-3


def _report(name, got, want, t0, failures, rtol=RTOL, atol=ATOL):
    got = [np.asarray(g, np.float32) for g in got]
    want = [np.asarray(w, np.float32) for w in want]
    err = max(float(np.max(np.abs(g - w) / (atol + rtol * np.abs(w))))
              for g, w in zip(got, want))
    ok = err <= 1.0 and all(np.all(np.isfinite(g)) for g in got)
    print(f"{'PASS' if ok else 'FAIL'} {name:34s} "
          f"rel-err {err:8.3f} ({time.perf_counter() - t0:6.1f}s)", flush=True)
    if not ok:
        failures.append(name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train-bwd", action="store_true",
                    help="skip the (compile-heavy) fused train bwd kernel")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if not any(d.platform == "tpu" for d in jax.devices()):
        print("no TPU device visible — this smoke needs the real chip")
        return 2

    from qa_tiger_tpu import nn as qnn
    from qa_tiger_tpu.models import modules as M
    from qa_tiger_tpu.models.qa_tiger import qa_tiger_config, qa_tiger_init
    from qa_tiger_tpu.ops.pallas import attention as A
    from qa_tiger_tpu.ops.pallas import gaussian_moe as G
    from qa_tiger_tpu.ops.pallas import patch_select as PS
    from qa_tiger_tpu.ops.pallas import resblock as R

    rng = np.random.default_rng(0)
    dev = jax.devices("tpu")[0]

    def arr(*shape):
        return jax.device_put(
            rng.standard_normal(shape).astype(np.float32), dev)

    failures: list[str] = []
    t_all = time.perf_counter()

    # ---- fused_attention (classic [BH, Sq, dh] layout) --------------------
    q, k, v = arr(8, 16, 64), arr(8, 16, 64), arr(8, 16, 64)
    scale = 64 ** -0.5
    t0 = time.perf_counter()
    got = A.fused_attention(q, k, v, None, scale, bh_tile=4, interpret=False)
    _report("fused_attention", [got],
            [A._reference_impl(q, k, v, None, scale)], t0, failures)

    mask = jnp.triu(jnp.full((16, 16), -jnp.inf, jnp.float32), 1)
    t0 = time.perf_counter()
    got = A.fused_attention(q, k, v, mask, scale, bh_tile=4, interpret=False)
    _report("fused_attention[causal]", [got],
            [A._reference_impl(q, k, v, mask, scale)], t0, failures)

    # ---- fused_attention_wide (heads-in-lanes, g=1 and packed g>1) --------
    heads = 4
    for tag, (b, sq, sk) in [("g>1", (8, 16, 16)), ("g=1", (4, 64, 64))]:
        qw, kw, vw = arr(b, sq, 128), arr(b, sk, 128), arr(b, sk, 128)
        t0 = time.perf_counter()
        got = A.fused_attention_wide(qw, kw, vw, None, 0.125, heads,
                                     interpret=False)
        _report(f"fused_attention_wide[{tag}]", [got],
                [A._wide_reference(qw, kw, vw, None, 0.125, heads)],
                t0, failures)

    qw, kw, vw = arr(8, 16, 128), arr(8, 16, 128), arr(8, 16, 128)
    kb = jnp.log1p(jnp.abs(arr(8, 16)))
    t0 = time.perf_counter()
    got = A.fused_attention_wide(qw, kw, vw, None, 0.125, heads,
                                 interpret=False, key_bias=kb)
    _report("fused_attention_wide[key_bias]", [got],
            [A._wide_reference(qw, kw, vw, None, 0.125, heads, kb)],
            t0, failures)

    # ---- fused_gaussian_moe ----------------------------------------------
    B, T, D, E, H = 8, 12, 128, 4, 64
    x = arr(B, T, D)
    w1t, b1 = arr(E, D, H), arr(E, H)
    w2t, b2 = arr(E, H, D), arr(E, D)
    w = jax.nn.softmax(arr(B, E, T), axis=-1)
    t0 = time.perf_counter()
    got = G.fused_gaussian_moe(x, w1t, b1, w2t, b2, w, 8, interpret=False)
    _report("fused_gaussian_moe", [got],
            [G._reference_impl(x, w1t, b1, w2t, b2, w)], t0, failures)

    # ---- resblock attention-half kernels (text-tower prod path) ----------
    W = 128
    key = jax.random.PRNGKey(0)
    rb = {
        "ln_1": qnn.layer_norm_init(W),
        "ln_2": qnn.layer_norm_init(W),
        "attn": qnn.mha_init(key, W),
    }
    # non-zero biases so the kernel's bias handling is actually exercised
    rb["attn"]["in_proj_bias"] = arr(3 * W).ravel() * 0.1
    rb["attn"]["out_proj"]["bias"] = arr(W).ravel() * 0.1
    rb = jax.device_put(rb, dev)
    xr = arr(4, 16, W)
    cmask = jnp.triu(jnp.full((16, 16), -jnp.inf, jnp.float32), 1)
    t0 = time.perf_counter()
    got = R.fused_attn_half(xr, rb, cmask, 4, interpret=False)
    _report("fused_attn_half", [got],
            [R._attn_half_jnp(rb, xr, heads=4, mask=cmask)], t0, failures)

    t0 = time.perf_counter()
    y, ln2 = R.fused_attn_ln2(xr, rb, cmask, 4, interpret=False)
    wy, wln2 = R._attn_ln2_jnp(rb, xr, heads=4, mask=cmask)
    _report("fused_attn_ln2", [y, ln2], [wy, wln2], t0, failures)

    # ---- fused_patch_select (eval) ----------------------------------------
    Bp, Tp, P, Dp, nhead = 2, 8, 14, 128, 2
    cfg = qa_tiger_config(d_model=Dp, video_dim=Dp, patch_dim=Dp,
                          audio_dim=Dp)
    ps = jax.device_put(
        qa_tiger_init(jax.random.PRNGKey(1), cfg,
                      init_text_encoder=False)["patch_selecter"], dev)
    patch = arr(Bp, Tp, P, Dp)
    audio, video = arr(Bp, Tp, Dp), arr(Bp, Tp, Dp)
    t0 = time.perf_counter()
    # tile must keep blocks (tile, 128) legal on TPU: second-minor % 8 == 0
    a_f, v_f = PS.fused_patch_select(patch, audio, video, ps, nhead, 8, False)
    a_r, v_r = M.patch_selecter_jnp(ps, patch, audio, video, nhead=nhead)
    _report("fused_patch_select[eval]", [a_f, v_f], [a_r, v_r], t0, failures)

    # ---- fused_patch_select_train (fwd, then fwd+bwd) ----------------------
    masks = M.make_patch_dropout_masks(jax.random.PRNGKey(2), Bp * Tp, P, Dp,
                                       nhead=nhead, dropout_p=0.1)
    masks = jax.device_put(masks, dev)
    t0 = time.perf_counter()
    a_t, v_t = PS.fused_patch_select_train(patch, audio, video, ps, masks,
                                           nhead, 8, False)
    a_m, v_m = PS._jnp_masked(patch, audio, video, ps, masks, nhead=nhead)
    # the train path compounds dropout 1/(1-p) scaling + LN chains on top of
    # the bf16-pass dots, and kernel vs XLA compose the roundings differently
    # (measured on-chip: maxabs ~7e-3 on near-zero outputs while BOTH sides
    # sit within ~2e-2 of the CPU fp32 truth) — scale atol accordingly
    _report("fused_patch_select_train[fwd]", [a_t, v_t], [a_m, v_m],
            t0, failures, atol=1e-2)

    # ---- fused_avq_train (fwd, then fwd+bwd) --------------------------------
    from qa_tiger_tpu.ops.pallas import avq as AVQ

    Na, Ta, Sa, Da, ha = 4, 8, 16, 128, 4
    avq_p = jax.device_put(
        M.avq_cross_attn_init(jax.random.PRNGKey(3), Da), dev)
    a_src, a_val, a_wrd = arr(Na, Ta, Da), arr(Na, Ta, Da), arr(Na, Sa, Da)
    avq_m = jax.device_put(M.make_avq_dropout_masks(
        jax.random.PRNGKey(4), Na, Ta, Sa, Da, nhead=ha, dropout_p=0.1), dev)
    t0 = time.perf_counter()
    got = AVQ.fused_avq_train(a_src, a_val, a_wrd, avq_p, avq_m, ha, 2,
                              False)
    want = AVQ._jnp_masked(a_src, a_val, a_wrd, avq_p, avq_m, nhead=ha)
    _report("fused_avq_train[fwd]", [got], [want], t0, failures, atol=1e-2)

    if not args.skip_train_bwd:
        def loss_ak(s, pr):
            out = AVQ.fused_avq_train(s, a_val, a_wrd, pr, avq_m, ha, 2,
                                      False)
            return jnp.sum(out ** 2)

        def loss_ar(s, pr):
            out = AVQ._jnp_masked(s, a_val, a_wrd, pr, avq_m, nhead=ha)
            return jnp.sum(out ** 2)

        t0 = time.perf_counter()
        gk = jax.grad(loss_ak, argnums=(0, 1))(a_src, avq_p)
        gr = jax.grad(loss_ar, argnums=(0, 1))(a_src, avq_p)
        # atol 0.1: the sum(out^2) cotangent is each side's OWN forward, and
        # the AVQ chain (3 attentions + FFN + 2 LNs) compounds bf16-pass dot
        # roundings deeper than patch_select. Measured on-chip 2026-08-19:
        # kernel and oracle norm2 grads sit EQUALLY off CPU fp32 truth
        # (|k-t| 0.187 vs |o-t| 0.183 on |t|max 64) — symmetric rounding,
        # while near-zero bias elements blow up an element-wise atol=1e-2.
        _report("fused_avq_train[bwd]",
                jax.tree_util.tree_leaves(gk),
                jax.tree_util.tree_leaves(gr), t0, failures, atol=0.1)

        # ---- fused_avq_train at the SHIPPED train shapes (compile gate) ----
        # The small shapes above can't catch scoped-vmem compile OOMs: at
        # N=64/T=60/S=77/D=512 the recompute-backward needed 112.9 MB at bwd
        # tile=8 vs the ~100 MB limit (on-chip 2026-08-19) — hence
        # AVQ_BWD_TILE=4. Compile + one step, finiteness only (a full-shape
        # oracle run would double the case's cost for no extra signal).
        Nf, Tf, Sf, Df, hf = 64, 60, 77, 512, 8
        f_p = jax.device_put(
            M.avq_cross_attn_init(jax.random.PRNGKey(5), Df), dev)
        f_src, f_val, f_wrd = (arr(Nf, Tf, Df), arr(Nf, Tf, Df),
                               arr(Nf, Sf, Df))
        f_m = jax.device_put(M.make_avq_dropout_masks(
            jax.random.PRNGKey(6), Nf, Tf, Sf, Df, nhead=hf, dropout_p=0.1),
            dev)

        def loss_full(s, pr):
            out = AVQ.fused_avq_train(s, f_val, f_wrd, pr, f_m, hf,
                                      AVQ.AVQ_TILE, False)
            return jnp.sum(out ** 2)

        t0 = time.perf_counter()
        try:
            gfull = jax.grad(loss_full, argnums=(0, 1))(f_src, f_p)
            leaves = jax.tree_util.tree_leaves(gfull)
            _report("fused_avq_train[bwd@shipped]", leaves, leaves, t0,
                    failures)
        except Exception as e:  # compile OOM / lowering fault
            print(f"FAIL fused_avq_train[bwd@shipped]   {type(e).__name__}: "
                  f"{str(e)[:200]} ({time.perf_counter() - t0:6.1f}s)",
                  flush=True)
            failures.append("fused_avq_train[bwd@shipped]")

    if not args.skip_train_bwd:
        def loss_k(pt, pr):
            a, v = PS.fused_patch_select_train(pt, audio, video, pr, masks,
                                               nhead, 8, False)
            return jnp.sum(a ** 2) + jnp.sum(v)

        def loss_r(pt, pr):
            a, v = PS._jnp_masked(pt, audio, video, pr, masks, nhead=nhead)
            return jnp.sum(a ** 2) + jnp.sum(v)

        t0 = time.perf_counter()
        gk = jax.grad(loss_k, argnums=(0, 1))(patch, ps)
        gr = jax.grad(loss_r, argnums=(0, 1))(patch, ps)
        _report("fused_patch_select_train[bwd]",
                jax.tree_util.tree_leaves(gk),
                jax.tree_util.tree_leaves(gr), t0, failures,
                # grads through LNs are cancellation-dominated; scale atol
                # to the oracle's own magnitude instead of an absolute floor
                atol=1e-2)

    total = time.perf_counter() - t_all
    if failures:
        print(f"SMOKE FAILED ({len(failures)}): {', '.join(failures)} "
              f"[{total:.0f}s]")
        return 1
    print(f"SMOKE OK — all kernels lower and match on-chip [{total:.0f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
