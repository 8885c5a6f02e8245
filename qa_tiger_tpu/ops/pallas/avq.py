"""Fused AVQCrossAttn train-mode kernels (forward + hand-written backward).

The reference's AVQ_CrossAttn (src/models/modules.py:159-265) is, per
direction, three MultiheadAttentions (question-guided, self, cross) whose
outputs join the residual stream through dropout, then LayerNorm -> FFN ->
dropout -> residual -> LayerNorm. Our model runs both directions as ONE
batched pass over a 2B batch (models/modules.py:avq_cross_attn), so at
train B=32 this is N=64 rows of [T=60, D=512] with THREE attentions under
attention-probability dropout.

Under dropout the XLA path cannot ride the fused attention_wide kernel
(the probability tensors must be masked), so every [N, H, T, T] prob
tensor AND its gradient round-trips HBM — the same failure mode the fused
PatchSelecter train kernels (ops/pallas/patch_select.py) removed. This
module applies the identical pattern to AVQ:

- the dropout realization is sampled ONCE per step as explicit
  multiplicative keep/(1-p) masks (models.modules.make_avq_dropout_masks),
  consumed by the fused forward, the fused backward, and the jnp oracle
  the tests pin both against;
- the forward runs one grid step per ``tile`` batch rows with every
  intermediate VMEM-resident;
- the backward recomputes the forward in VMEM and accumulates parameter
  gradients in fp32 across the sequential grid into constant-index blocks
  (exactly patch_select._kernel_bwd's scheme).

Attention layout: 3D blocks [tile, T, D] with per-head lane slices and
dot_general batch dims over the tile axis (the resblock kernel's
_attn_core layout) — q/k/v never materialize in a [N*H, T, hd] layout.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False

# batch rows per grid step (N=2B must be divisible after padding);
# QA_TIGER_AVQ_TILE for on-chip ablations
AVQ_TILE = int(os.environ.get("QA_TIGER_AVQ_TILE", "8"))

# The recompute-backward holds the whole forward's intermediates PLUS the
# reverse chain live at once, so its stack is ~2.7x the forward's per batch
# row: at the shipped shapes (N=64, T=60, S=77, D=512) tile=8 needs 112.9 MB
# scoped vmem vs the ~100 MB limit (compile-time OOM, on-chip 2026-08-19,
# masked by the smaller smoke shapes). The fixed part (20 fp32 weights +
# 20 fp32 grad accumulators, ~30 MB) doesn't scale with tile, so halving
# the bwd tile to 4 lands the stack at ~71 MB with margin.
AVQ_BWD_TILE = int(os.environ.get("QA_TIGER_AVQ_BWD_TILE", "4"))

# QA_TIGER_AVQ_V=stack (DEFAULT): every head's scores row-stacked through
# ONE softmax chain per attention (and one stacked dsoftmax chain in the
# backward) instead of `heads` serialized per-head VPU chains. This is the
# resblock kernel's round-5 stack layout (measured there: 1.918 -> 1.863
# ms/layer AND Mosaic compile 594 -> 58 s); this module has 3 attentions
# x 8 heads per kernel — 24 fwd chains + 48 in the recompute-backward —
# which is what drove the full-shape train compile past the 40 min
# timeout on-chip (2026-08-19). QA_TIGER_AVQ_V= restores the loop.
AVQ_V = os.environ.get("QA_TIGER_AVQ_V", "stack")


def _ln(x32, w, b, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * w + b


def _ln_bwd(x32, w, g, eps=1e-5):
    """d/dx, d/dw, d/db of LayerNorm(x)*w+b given upstream g (fp32)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rinv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rinv
    gxh = g * w
    gx = rinv * (gxh - jnp.mean(gxh, axis=-1, keepdims=True)
                 - xhat * jnp.mean(gxh * xhat, axis=-1, keepdims=True))
    gw = jnp.sum(g * xhat, axis=0, keepdims=True)
    gb = jnp.sum(g, axis=0, keepdims=True)
    return gx, gw, gb


def _dot32(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dotT_ab(a, b):  # a^T @ b, fp32 accumulation ([R, M]^T @ [R, N])
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_abT(a, b):  # a @ b^T, fp32 accumulation
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-dim) dot with fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _pad_rows(x, Tp, Tq):
    """Pad a [nb, Tq, Sk] block to Tp rows on axis 1 (8-sublane align)."""
    if Tp == Tq:
        return x
    nb, _, Sk = x.shape
    return jnp.concatenate([x, jnp.zeros((nb, Tp - Tq, Sk), x.dtype)],
                           axis=1)


def _attn_fwd(q3, k3, v3, keep2d, *, heads, scale, dt, want_probs=False):
    """Per-head attention over 3D blocks. In loop mode keep2d is the
    [tile*Tq, heads*Sk] pre-scaled prob-dropout mask (lane h*Sk+key); under
    AVQ_V=stack it arrives HOST-pre-stacked as [tile, heads*Tp, Sk]
    (_stack_mask) so the kernel never concatenates mask slices — Mosaic's
    tpu.concatenate requires uniform lane offsets and the h*Sk lane-slice
    layouts broke it ("result/input offset mismatch", on-chip 2026-08-19).
    Returns ctx [tile, Tq, D] (+ (P, Pd) intermediates when want_probs:
    the stacked fp32 prob block and None under stack mode — the backward
    recomputes pd from prob and the stacked mask — per-head lists in loop
    mode; _attn_bwd branches on the same flag so the formats agree)."""
    nb, Tq, D = q3.shape
    Sk = k3.shape[1]
    hd = D // heads
    ctxs, Ps, Pds = [], [], []
    if AVQ_V == "stack":
        # every head's scores through ONE softmax chain (row-stacked, each
        # block padded to the 8-sublane boundary so slices stay aligned;
        # pad rows softmax to uniform and are discarded). Only dot outputs
        # (uniform zero-offset layouts) are ever concatenated.
        Tp = -(-Tq // 8) * 8
        blocks = []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = _bdot(q3[:, :, sl], k3[:, :, sl], 2, 2) * scale
            blocks.append(_pad_rows(s, Tp, Tq))
        sall = jnp.concatenate(blocks, axis=1)        # [nb, heads*Tp, Sk]
        sall = sall - jax.lax.stop_gradient(
            jnp.max(sall, axis=-1, keepdims=True))
        e = jnp.exp(sall)
        prob_all = e / jnp.sum(e, axis=-1, keepdims=True)    # fp32
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            prob = prob_all[:, h * Tp:h * Tp + Tq]
            keep = keep2d[:, h * Tp:h * Tp + Tq]
            pd = (prob * keep.astype(prob.dtype)).astype(dt)
            ctxs.append(_bdot(pd, v3[:, :, sl], 2, 1).astype(dt))
        ctx = jnp.concatenate(ctxs, axis=-1)                 # [nb, Tq, D]
        if want_probs:
            return ctx, prob_all, None
        return ctx
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = _bdot(q3[:, :, sl], k3[:, :, sl], 2, 2) * scale  # [nb,Tq,Sk]
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s)
        prob = e / jnp.sum(e, axis=-1, keepdims=True)        # fp32
        keep = keep2d[:, h * Sk:(h + 1) * Sk].reshape(nb, Tq, Sk)
        pd = (prob * keep.astype(prob.dtype)).astype(dt)
        ctxs.append(_bdot(pd, v3[:, :, sl], 2, 1).astype(dt))
        if want_probs:
            Ps.append(prob)
            Pds.append(pd)
    ctx = jnp.concatenate(ctxs, axis=-1)                     # [nb, Tq, D]
    if want_probs:
        return ctx, Ps, Pds
    return ctx


def _attn_bwd(g_ctx3, q3, k3, v3, Ps, Pds, keep2d, *, heads, scale, dt):
    """Gradients of _attn_fwd w.r.t. q3, k3, v3 given g_ctx3 [nb,Tq,D].
    Under AVQ_V=stack, Ps/Pds are the stacked [nb, heads*Tp, Sk] arrays
    and the dsoftmax reduce chain runs ONCE over the stacked block."""
    nb, Tq, D = q3.shape
    Sk = k3.shape[1]
    hd = D // heads
    gq, gk, gv = [], [], []
    if AVQ_V == "stack":
        Tp = -(-Tq // 8) * 8
        prob_all = Ps                       # stacked [nb, heads*Tp, Sk]
        gPd_blocks = []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            gc = g_ctx3[:, :, sl]                            # [nb,Tq,hd]
            # recompute pd for this head from the stacked prob + mask
            # (cheaper than stacking pd in the forward, and it keeps every
            # concatenated block a zero-offset dot output)
            pd = (prob_all[:, h * Tp:h * Tp + Tq]
                  * keep2d[:, h * Tp:h * Tp + Tq].astype(jnp.float32)
                  ).astype(dt)
            gv.append(_bdot(pd, gc, 1, 1).astype(dt))        # [nb,Sk,hd]
            gPd_blocks.append(_pad_rows(_bdot(gc, v3[:, :, sl], 2, 2),
                                        Tp, Tq))
        # stacked mask rows are zero in the pad region, so gP pads to 0
        gP_all = (jnp.concatenate(gPd_blocks, axis=1)
                  * keep2d.astype(jnp.float32))
        # dsoftmax over the stacked block (pad rows: gP=0 -> gS=0)
        gS_all = (prob_all * (gP_all - jnp.sum(gP_all * prob_all, axis=-1,
                                               keepdims=True))).astype(dt)
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            gS = gS_all[:, h * Tp:h * Tp + Tq]
            gq.append((_bdot(gS, k3[:, :, sl], 2, 1) * scale).astype(dt))
            gk.append((_bdot(gS, q3[:, :, sl], 1, 1) * scale).astype(dt))
        return (jnp.concatenate(gq, axis=-1),
                jnp.concatenate(gk, axis=-1),
                jnp.concatenate(gv, axis=-1))
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        gc = g_ctx3[:, :, sl]                                # [nb,Tq,hd]
        gPd = _bdot(gc, v3[:, :, sl], 2, 2)                  # [nb,Tq,Sk]
        gv.append(_bdot(Pds[h], gc, 1, 1).astype(dt))        # [nb,Sk,hd]
        keep = keep2d[:, h * Sk:(h + 1) * Sk].reshape(nb, Tq, Sk)
        gP = gPd * keep.astype(gPd.dtype)
        prob = Ps[h]
        gS = (prob * (gP - jnp.sum(gP * prob, axis=-1, keepdims=True))
              ).astype(dt)
        gq.append((_bdot(gS, k3[:, :, sl], 2, 1) * scale).astype(dt))
        gk.append((_bdot(gS, q3[:, :, sl], 1, 1) * scale).astype(dt))
    return (jnp.concatenate(gq, axis=-1),
            jnp.concatenate(gk, axis=-1),
            jnp.concatenate(gv, axis=-1))


# weight tuple order (all pre-transposed to [in, out] outside the grid)
# 0 qst_w [D,3D], 1 qst_b, 2 qst_ow [D,D], 3 qst_ob,
# 4 slf_w, 5 slf_b, 6 slf_ow, 7 slf_ob,
# 8 crs_w, 9 crs_b, 10 crs_ow, 11 crs_ob,
# 12 w1 [D,D], 13 b1, 14 w2 [D,D], 15 b2,
# 16 n1w, 17 n1b, 18 n2w, 19 n2b
def _pack_params(params):
    qst, slf, crs = (params["qst_attn"], params["slf_attn"],
                     params["crs_attn"])
    return (
        qst["in_proj_weight"].T, qst["in_proj_bias"],
        qst["out_proj"]["weight"].T, qst["out_proj"]["bias"],
        slf["in_proj_weight"].T, slf["in_proj_bias"],
        slf["out_proj"]["weight"].T, slf["out_proj"]["bias"],
        crs["in_proj_weight"].T, crs["in_proj_bias"],
        crs["out_proj"]["weight"].T, crs["out_proj"]["bias"],
        params["linear1"]["weight"].T, params["linear1"]["bias"],
        params["linear2"]["weight"].T, params["linear2"]["bias"],
        params["norm1"]["weight"], params["norm1"]["bias"],
        params["norm2"]["weight"], params["norm2"]["bias"],
    )


def _load_w(refs):
    """Load the 20 weight refs: 2D weights whole, [1, X] biases/norm params
    as their 1D row via ``ref[0]`` — the patch_select idiom. Slicing a 1D
    bias row ([D:]) then broadcasting it lowers cleanly in Mosaic, whereas
    the combined ``ref[:][0, D:]`` index produced a value whose layout kept
    lane offset 128 and failed ``vector.broadcast`` ("Invalid input
    layout", on-chip smoke 2026-08-19)."""
    return tuple(r[0] if r.shape[0] == 1 else r[:] for r in refs)


def _fwd_body(src_ref, val_ref, wrd_ref,
              mqst_ref, mslf_ref, mcrs_ref,
              mdslf_ref, mdcrs_ref, mdqst_ref, mffn1_ref, mffn2_ref,
              w, *, heads, want_inter=False):
    """Shared forward math on one grid block; ``w`` is the 20-ref weight
    tuple. With want_inter, returns the intermediates the backward needs."""
    nb, T, D = src_ref.shape
    S = wrd_ref.shape[1]
    dt = src_ref.dtype
    scale = 1.0 / math.sqrt(D // heads)
    R = nb * T

    x0 = src_ref[:]
    x0_2 = x0.reshape(R, D)
    wrd2 = wrd_ref[:].reshape(nb * S, D)
    val2 = val_ref[:].reshape(R, D)

    # ---- question-guided attention (kv from the words stream)
    qq = (_dot32(x0_2, w[0][:, :D]) + w[1][:D]).astype(dt)
    kvq = (_dot32(wrd2, w[0][:, D:]) + w[1][D:]).astype(dt)
    q3 = qq.reshape(nb, T, D)
    kq3 = kvq[:, :D].reshape(nb, S, D)
    vq3 = kvq[:, D:].reshape(nb, S, D)
    qst_ctx, Pq, Pdq = _attn_fwd(q3, kq3, vq3, mqst_ref[:], heads=heads,
                                 scale=scale, dt=dt, want_probs=True)
    qst_ctx2 = qst_ctx.reshape(R, D)
    qst_out = (_dot32(qst_ctx2, w[2]) + w[3]).astype(dt)

    # ---- self attention
    qkv = (_dot32(x0_2, w[4]) + w[5]).astype(dt)
    s_q3 = qkv[:, :D].reshape(nb, T, D)
    s_k3 = qkv[:, D:2 * D].reshape(nb, T, D)
    s_v3 = qkv[:, 2 * D:].reshape(nb, T, D)
    slf_ctx, Ps, Pds = _attn_fwd(s_q3, s_k3, s_v3, mslf_ref[:], heads=heads,
                                 scale=scale, dt=dt, want_probs=True)
    slf_ctx2 = slf_ctx.reshape(R, D)
    slf_out = (_dot32(slf_ctx2, w[6]) + w[7]).astype(dt)

    # ---- cross attention (kv from the other a/v stream)
    qc = (_dot32(x0_2, w[8][:, :D]) + w[9][:D]).astype(dt)
    kvc = (_dot32(val2, w[8][:, D:]) + w[9][D:]).astype(dt)
    c_q3 = qc.reshape(nb, T, D)
    c_k3 = kvc[:, :D].reshape(nb, T, D)
    c_v3 = kvc[:, D:].reshape(nb, T, D)
    crs_ctx, Pc, Pdc = _attn_fwd(c_q3, c_k3, c_v3, mcrs_ref[:], heads=heads,
                                 scale=scale, dt=dt, want_probs=True)
    crs_ctx2 = crs_ctx.reshape(R, D)
    crs_out = (_dot32(crs_ctx2, w[10]) + w[11]).astype(dt)

    # ---- residual + LN1 + FFN + LN2 (ref modules.py:215-238)
    x1 = (x0_2 + mdslf_ref[:].astype(dt) * slf_out
          + mdcrs_ref[:].astype(dt) * crs_out
          + mdqst_ref[:].astype(dt) * qst_out)
    x1_32 = x1.astype(jnp.float32)
    h1 = _ln(x1_32, w[16], w[17]).astype(dt)
    pre = _dot32(h1, w[12]) + w[13]
    hr = jax.nn.relu(pre).astype(dt)
    hdp = hr * mffn1_ref[:].astype(dt)
    ffn = (_dot32(hdp, w[14]) + w[15]).astype(dt)
    x2 = h1 + mffn2_ref[:].astype(dt) * ffn
    x2_32 = x2.astype(jnp.float32)
    out = _ln(x2_32, w[18], w[19]).astype(dt)
    if not want_inter:
        return out.reshape(nb, T, D)
    inter = dict(
        x0_2=x0_2, wrd2=wrd2, val2=val2,
        q3=q3, kq3=kq3, vq3=vq3, Pq=Pq, Pdq=Pdq, qst_ctx2=qst_ctx2,
        s_q3=s_q3, s_k3=s_k3, s_v3=s_v3, Ps=Ps, Pds=Pds, slf_ctx2=slf_ctx2,
        c_q3=c_q3, c_k3=c_k3, c_v3=c_v3, Pc=Pc, Pdc=Pdc, crs_ctx2=crs_ctx2,
        x1_32=x1_32, h1=h1, pre=pre, hdp=hdp, x2_32=x2_32,
    )
    return out.reshape(nb, T, D), inter


def _kernel_fwd(src_ref, val_ref, wrd_ref,
                mqst_ref, mslf_ref, mcrs_ref,
                mdslf_ref, mdcrs_ref, mdqst_ref, mffn1_ref, mffn2_ref,
                *refs, heads):
    w = _load_w(refs[:20])
    (out_ref,) = refs[20:]
    out_ref[:] = _fwd_body(src_ref, val_ref, wrd_ref,
                           mqst_ref, mslf_ref, mcrs_ref,
                           mdslf_ref, mdcrs_ref, mdqst_ref,
                           mffn1_ref, mffn2_ref, w, heads=heads)


def _kernel_bwd(src_ref, val_ref, wrd_ref,
                mqst_ref, mslf_ref, mcrs_ref,
                mdslf_ref, mdcrs_ref, mdqst_ref, mffn1_ref, mffn2_ref,
                g_ref, *refs, heads):
    """Hand-derived backward: recompute the forward in VMEM, then reverse.
    Parameter gradients accumulate in fp32 into constant-index blocks."""
    w = _load_w(refs[:20])
    (gsrc_ref, gval_ref, gwrd_ref) = refs[20:23]
    gw = refs[23:]  # 20 param-grad refs, same packed layout as w

    nb, T, D = src_ref.shape
    S = wrd_ref.shape[1]
    dt = src_ref.dtype
    scale = 1.0 / math.sqrt(D // heads)
    R = nb * T

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in gw:
            ref[:] = jnp.zeros_like(ref)

    _, it = _fwd_body(src_ref, val_ref, wrd_ref,
                      mqst_ref, mslf_ref, mcrs_ref,
                      mdslf_ref, mdcrs_ref, mdqst_ref,
                      mffn1_ref, mffn2_ref, w, heads=heads,
                      want_inter=True)

    g = g_ref[:].reshape(R, D).astype(jnp.float32)

    # ---- LN2 / FFN / LN1
    g_x2, gn2w, gn2b = _ln_bwd(it["x2_32"], w[18], g)
    gw[18][:] += gn2w
    gw[19][:] += gn2b
    g_ffn = (g_x2 * mffn2_ref[:]).astype(dt)
    g_hdp = _dot_abT(g_ffn, w[14]).astype(dt)
    gw[14][:] += _dotT_ab(it["hdp"], g_ffn)
    gw[15][:] += jnp.sum(g_ffn.astype(jnp.float32), axis=0, keepdims=True)
    g_hr = g_hdp * mffn1_ref[:].astype(dt)
    g_pre = jnp.where(it["pre"] > 0, g_hr.astype(jnp.float32), 0.0)
    g_pre_dt = g_pre.astype(dt)
    g_h1 = g_x2 + _dot_abT(g_pre_dt, w[12])
    gw[12][:] += _dotT_ab(it["h1"], g_pre_dt)
    gw[13][:] += jnp.sum(g_pre, axis=0, keepdims=True)
    g_x1, gn1w, gn1b = _ln_bwd(it["x1_32"], w[16], g_h1)
    gw[16][:] += gn1w
    gw[17][:] += gn1b

    g_src2 = g_x1  # residual path into x0 (fp32)

    def out_proj_bwd(g_out, ctx2, ow_idx):
        g_out = g_out.astype(dt)
        g_ctx2 = _dot_abT(g_out, w[ow_idx]).astype(dt)
        gw[ow_idx][:] += _dotT_ab(ctx2, g_out)
        gw[ow_idx + 1][:] += jnp.sum(g_out.astype(jnp.float32),
                                     axis=0, keepdims=True)
        return g_ctx2.reshape(nb, T, D)

    # ---- question-guided attention backward
    g_qst_ctx3 = out_proj_bwd(g_x1 * mdqst_ref[:], it["qst_ctx2"], 2)
    g_qq3, g_kq3, g_vq3 = _attn_bwd(
        g_qst_ctx3, it["q3"], it["kq3"], it["vq3"], it["Pq"], it["Pdq"],
        mqst_ref[:], heads=heads, scale=scale, dt=dt)
    g_qq = g_qq3.reshape(R, D)
    gw[0][:, :D] += _dotT_ab(it["x0_2"], g_qq)
    g_kvq = jnp.concatenate(
        [g_kq3.reshape(nb * S, D), g_vq3.reshape(nb * S, D)], axis=-1)
    gw[0][:, D:] += _dotT_ab(it["wrd2"], g_kvq)
    gw[1][:, :D] += jnp.sum(g_qq.astype(jnp.float32), axis=0, keepdims=True)
    gw[1][:, D:] += jnp.sum(g_kvq.astype(jnp.float32), axis=0,
                            keepdims=True)
    g_src2 = g_src2 + _dot_abT(g_qq, w[0][:, :D])
    gwrd_ref[:] = _dot_abT(g_kvq, w[0][:, D:]).astype(dt).reshape(nb, S, D)

    # ---- self attention backward
    g_slf_ctx3 = out_proj_bwd(g_x1 * mdslf_ref[:], it["slf_ctx2"], 6)
    g_sq3, g_sk3, g_sv3 = _attn_bwd(
        g_slf_ctx3, it["s_q3"], it["s_k3"], it["s_v3"], it["Ps"], it["Pds"],
        mslf_ref[:], heads=heads, scale=scale, dt=dt)
    g_qkv = jnp.concatenate(
        [g_sq3.reshape(R, D), g_sk3.reshape(R, D), g_sv3.reshape(R, D)],
        axis=-1)
    gw[4][:] += _dotT_ab(it["x0_2"], g_qkv)
    gw[5][:] += jnp.sum(g_qkv.astype(jnp.float32), axis=0, keepdims=True)
    g_src2 = g_src2 + _dot_abT(g_qkv, w[4])

    # ---- cross attention backward
    g_crs_ctx3 = out_proj_bwd(g_x1 * mdcrs_ref[:], it["crs_ctx2"], 10)
    g_cq3, g_ck3, g_cv3 = _attn_bwd(
        g_crs_ctx3, it["c_q3"], it["c_k3"], it["c_v3"], it["Pc"], it["Pdc"],
        mcrs_ref[:], heads=heads, scale=scale, dt=dt)
    g_qc = g_cq3.reshape(R, D)
    gw[8][:, :D] += _dotT_ab(it["x0_2"], g_qc)
    g_kvc = jnp.concatenate(
        [g_ck3.reshape(R, D), g_cv3.reshape(R, D)], axis=-1)
    gw[8][:, D:] += _dotT_ab(it["val2"], g_kvc)
    gw[9][:, :D] += jnp.sum(g_qc.astype(jnp.float32), axis=0, keepdims=True)
    gw[9][:, D:] += jnp.sum(g_kvc.astype(jnp.float32), axis=0,
                            keepdims=True)
    g_src2 = g_src2 + _dot_abT(g_qc, w[8][:, :D])
    gval_ref[:] = _dot_abT(g_kvc, w[8][:, D:]).astype(dt).reshape(nb, T, D)

    gsrc_ref[:] = g_src2.astype(dt).reshape(nb, T, D)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------

def _pad_batch(x, n):
    return jnp.pad(x, ((0, n),) + ((0, 0),) * (x.ndim - 1)) if n else x


def _stack_mask(m, T, heads, Sk):
    """[N*T, >=heads*Sk] lane-padded attention-prob mask -> head-stacked
    [N, heads*Tp, Sk] (Tp = T rounded up to the 8-sublane boundary; pad
    rows zero). Runs in XLA outside the kernel, so the kernel's stacked
    softmax / dsoftmax chains consume the mask with plain aligned row
    slices instead of per-head lane slices (whose layouts Mosaic cannot
    concatenate). Sk is the true key length — the mask's lane dim carries
    128-boundary padding that must be stripped before the head split."""
    N = m.shape[0] // T
    Tp = -(-T // 8) * 8
    m4 = jnp.moveaxis(m[:, :heads * Sk].reshape(N, T, heads, Sk), 2, 1)
    if Tp > T:
        m4 = jnp.pad(m4, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    return m4.reshape(N, heads * Tp, Sk)


def _geometry(src, val, wrd, masks, tile, heads):
    N, T, D = src.shape
    pad = (-N) % tile
    arrs = (_pad_batch(src, pad), _pad_batch(val, pad), _pad_batch(wrd, pad))
    m = tuple(_pad_batch(masks[k], pad * T)
              for k in ("qst", "slf", "crs",
                        "d_slf", "d_crs", "d_qst", "ffn1", "ffn2"))
    if AVQ_V == "stack":
        S = wrd.shape[1]
        m = (_stack_mask(m[0], T, heads, S), _stack_mask(m[1], T, heads, T),
             _stack_mask(m[2], T, heads, T)) + m[3:]
    return N, T, D, pad, arrs, m


def _cast_flat_w(flat_w, dt):
    return tuple((w if w.ndim == 2 else w[None]).astype(dt) for w in flat_w)


def _w_specs(flat_w):
    return [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
            for w in flat_w]


def _data_specs(tile, T, S, D, m):
    return ([
        pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile, S, D), lambda i: (i, 0, 0)),
    ] + [pl.BlockSpec((tile,) + mm.shape[1:], lambda i: (i, 0, 0))
         if mm.ndim == 3 else
         pl.BlockSpec((tile * T, mm.shape[1]), lambda i: (i, 0))
         for mm in m])


def _compiler_kwargs(interpret, mb):
    if _HAVE_PLTPU and not interpret:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=mb * 2 ** 20)}
    return {}


def _pallas_fwd(src, val, wrd, masks, flat_w, *, nhead, tile, interpret):
    N, T, D, pad, (srcp, valp, wrdp), m = _geometry(src, val, wrd, masks,
                                                    tile, nhead)
    S = wrd.shape[1]
    dt = src.dtype
    n = (N + pad) // tile
    flat_w = _cast_flat_w(flat_w, dt)
    out = pl.pallas_call(
        functools.partial(_kernel_fwd, heads=nhead),
        out_shape=jax.ShapeDtypeStruct((N + pad, T, D), dt),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=_data_specs(tile, T, S, D, m) + _w_specs(flat_w),
            out_specs=pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0))),
        interpret=interpret,
        **_compiler_kwargs(interpret, 64),
    )(srcp, valp, wrdp, *m, *flat_w)
    return out[:N]


def _pallas_bwd(src, val, wrd, masks, flat_w, g, *, nhead, tile, interpret):
    tile = min(tile, AVQ_BWD_TILE)  # see AVQ_BWD_TILE note above
    N, T, D, pad, (srcp, valp, wrdp), m = _geometry(src, val, wrd, masks,
                                                    tile, nhead)
    S = wrd.shape[1]
    dt = src.dtype
    n = (N + pad) // tile
    flat_w = _cast_flat_w(flat_w, dt)
    gp = _pad_batch(g.astype(dt), pad)

    const = lambda i: (0, 0)  # noqa: E731
    gw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_w]
    gw_specs = [pl.BlockSpec(w.shape, const) for w in flat_w]
    res = pl.pallas_call(
        functools.partial(_kernel_bwd, heads=nhead),
        out_shape=(
            jax.ShapeDtypeStruct((N + pad, T, D), dt),
            jax.ShapeDtypeStruct((N + pad, T, D), dt),
            jax.ShapeDtypeStruct((N + pad, S, D), dt),
            *gw_shapes,
        ),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=(_data_specs(tile, T, S, D, m)
                      + [pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0))]
                      + _w_specs(flat_w)),
            out_specs=(
                pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile, T, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile, S, D), lambda i: (i, 0, 0)),
                *gw_specs,
            )),
        interpret=interpret,
        **_compiler_kwargs(interpret, 96),
    )(srcp, valp, wrdp, *m, gp, *flat_w)
    return res[0][:N], res[1][:N], res[2][:N], res[3:]


def _unpack_param_grads(gs, params):
    """Packed-layout kernel gradients -> the AVQ params pytree."""
    def like(g, ref):
        return g.astype(ref.dtype)

    def mha_grads(gin, gb, gow, gob, p):
        return {
            "in_proj_weight": like(gin.T, p["in_proj_weight"]),
            "in_proj_bias": like(gb[0], p["in_proj_bias"]),
            "out_proj": {
                "weight": like(gow.T, p["out_proj"]["weight"]),
                "bias": like(gob[0], p["out_proj"]["bias"]),
            },
        }

    return {
        "qst_attn": mha_grads(gs[0], gs[1], gs[2], gs[3],
                              params["qst_attn"]),
        "slf_attn": mha_grads(gs[4], gs[5], gs[6], gs[7],
                              params["slf_attn"]),
        "crs_attn": mha_grads(gs[8], gs[9], gs[10], gs[11],
                              params["crs_attn"]),
        "linear1": {"weight": like(gs[12].T, params["linear1"]["weight"]),
                    "bias": like(gs[13][0], params["linear1"]["bias"])},
        "linear2": {"weight": like(gs[14].T, params["linear2"]["weight"]),
                    "bias": like(gs[15][0], params["linear2"]["bias"])},
        "norm1": {"weight": like(gs[16][0], params["norm1"]["weight"]),
                  "bias": like(gs[17][0], params["norm1"]["bias"])},
        "norm2": {"weight": like(gs[18][0], params["norm2"]["weight"]),
                  "bias": like(gs[19][0], params["norm2"]["bias"])},
    }


def _jnp_masked(src, val, wrd, params, masks, *, nhead):
    from qa_tiger_tpu.models import modules as M

    return M.avq_sub_forward_masked(params, src, val, wrd, masks,
                                    nhead=nhead)


def _on_tpu(x) -> bool:
    from qa_tiger_tpu.ops.pallas.gaussian_moe import _on_tpu as impl

    return impl(x)


def _use_pallas(src, interpret):
    if not _HAVE_PLTPU:
        return False, False
    if interpret is None:
        return _on_tpu(src), False
    return True, interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_avq_train(src, val, wrd, params, masks,
                    nhead: int = 8, tile: int = AVQ_TILE,
                    interpret: Optional[bool] = None):
    """Train-mode AVQ sub-forward (one direction over the batched 2B rows):
    fused forward AND fused hand-written backward, dropout passed in as
    explicit masks (models.modules.make_avq_dropout_masks) so both
    directions and the jnp oracle see identical randomness.

    src/val [N, T, D], wrd [N, S, D]; returns [N, T, D]."""
    return _forward(src, val, wrd, params, masks, nhead, tile, interpret)


def _forward(src, val, wrd, params, masks, nhead, tile, interpret):
    use, interp = _use_pallas(src, interpret)
    if not use:
        return _jnp_masked(src, val, wrd, params, masks, nhead=nhead)
    return _pallas_fwd(src, val, wrd, masks, _pack_params(params),
                       nhead=nhead, tile=tile, interpret=interp)


def _fwd_rule(src, val, wrd, params, masks, nhead, tile, interpret):
    out = _forward(src, val, wrd, params, masks, nhead, tile, interpret)
    return out, (src, val, wrd, params, masks)


def _bwd_rule(nhead, tile, interpret, res, g):
    src, val, wrd, params, masks = res
    use, interp = _use_pallas(src, interpret)
    if not use:
        _, vjp = jax.vjp(
            lambda s, v, q, p: _jnp_masked(s, v, q, p, masks, nhead=nhead),
            src, val, wrd, params)
        gsrc, gval, gwrd, gparams = vjp(g)
    else:
        gsrc, gval, gwrd, gws = _pallas_bwd(
            src, val, wrd, masks, _pack_params(params), g,
            nhead=nhead, tile=tile, interpret=interp)
        gparams = _unpack_param_grads(gws, params)
    gmasks = jax.tree_util.tree_map(jnp.zeros_like, masks)
    return gsrc, gval, gwrd, gparams, gmasks


fused_avq_train.defvjp(_fwd_rule, _bwd_rule)
