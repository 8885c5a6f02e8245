"""Fused CLIP transformer resblock Pallas kernels (text + image towers).

A pre-LN CLIP resblock (reference: src/models/base/clip_base.py:186-219) is
two residual halves:

    x = x + out_proj(attn(ln_1(x)))          # attention half
    x = x + c_proj(quick_gelu(c_fc(ln_2(x))))  # MLP half

Run as separate XLA ops at the shipped text-tower sizes (B=256, S=77, W=768),
every intermediate makes an HBM round trip: the packed qkv tensor alone is
[256, 77, 2304] (~87 MB bf16) written and re-read per layer, and the MLP
hidden [256*77, 3072] is ~116 MB each way. Measured on v5e the 12-layer text
tower costs ~34 ms of the ~50 ms forward at ~45% MFU — the remainder is HBM
traffic, not FLOPs.

These kernels run each half entirely in VMEM:

- ``attention half``: ln_1, the packed [W, 3W] qkv projection, per-head
  attention with the heads-in-lanes layout (q/k/v stay [*, S, W]; g batch
  elements share one packed score matrix with a block-diagonal -inf mask,
  exactly like ops/pallas/attention.py:_wide_kernel), the output projection,
  and the residual add — one kernel, one x read, one x write.
- ``MLP half``: ln_2, c_fc, QuickGELU, c_proj, residual. For wide towers
  (W=1024: c_fc+c_proj are ~17 MB bf16, over the VMEM budget) the hidden dim
  is processed in chunks with the output block resident across the inner
  grid axis (partial products accumulate in place).

Numerics: LayerNorms and softmax in fp32, dots bf16-in/fp32-accumulate
(upcasting inputs would force the 4x-slower fp32 MXU mode). Gradients
rematerialize through the jnp formulation via custom VJP (the towers are
frozen in training, but the e2e graph differentiates through nothing here
anyway — the VJP exists for completeness and tests).

MEASURED RESULT (v5e, B=256 S=77 W=768 bf16, text-tower layer): attention
half 2.67 ms, MLP half 2.56 ms = 5.2 ms fused, vs 4.16 ms for the jnp
formulation whose attention already rides the packed heads-in-lanes kernel
(ops/pallas/attention.py) and whose ln/proj/MLP XLA fuses on its own; the
attention half alone also costs ~199 s of Mosaic compile (the unrolled
12-head loop). NOT routed by default — clip_text.resblock keeps the jnp
path; this module stays as a tested opt-in and a recorded negative result:
VMEM-residency does not beat XLA's own fusion once the attention is already
a Pallas kernel and the weights are streamed just once per grid.
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

VMEM_TOTAL = 15 * 1024 * 1024  # weights + activations ceiling under the
# DEFAULT 16 MB scoped-vmem limit (one step up OOMs there) — still used by
# the MLP-half kernel, which keeps the default limit.

# The attention-half kernels raise the scoped-vmem limit instead (v5e has
# 128 MB): more rows per grid step = fewer grid steps amortizing the
# weights/launch overhead. r is still capped at ATTN_R (env
# QA_TIGER_ATTN_R for on-chip ablations).
ATTN_VMEM = 60 * 1024 * 1024
ATTN_VMEM_LIMIT = 64 * 1024 * 1024
ATTN_R = int(os.environ.get("QA_TIGER_ATTN_R", "8"))

# Two-heads-per-dot K-packing for the per-head attention loop (on-chip
# ablation flag). Head pairs are ADJACENT 128-lane slices of the packed qkv
# buffer, so with Q stacked block-diagonally along rows
# ([q_h0 | 0; 0 | q_h1], rows zero-padded to the 8-sublane boundary) one
# [2*gSp, 2*hd] x [2*hd, gS] dot yields BOTH heads' exact scores: full MXU
# K-dim (128 vs 64) and half the dot issues, with NO score-area inflation
# (the block-diagonal QUERY packings that inflate area hg^2-fold are the
# measured losses in docs/PROFILE.md; this packs the CONTRACTION dim).
ATTN_PAIR = os.environ.get("QA_TIGER_ATTN_PAIR", "0") == "1"

# Round-5 layout work on the last 0.27 ms/layer of attn-half slack
# (docs/PROFILE.md "Remaining headroom" #1 + the round-5 decomposition):
# - QA_TIGER_ATTN_V=stack (DEFAULT): per-head scores row-stacked into ONE
#   [r, heads*ceil8(gS), gS] block so the fp32 softmax runs as a single
#   VPU chain instead of 12 serialized per-head chains. Measured 1.918 ->
#   1.863 ms/layer in the scan harness AND Mosaic compile 594 -> 58 s.
#   QA_TIGER_ATTN_V= (empty) restores the per-head loop for A/Bs.
# - QA_TIGER_ATTN_ABLATE=nosoftmax: softmax replaced by a scale (NOT
#   numerically valid — ablation only) to price the whole softmax chain
#   (measured: 0.146 ms/layer).
ATTN_V = os.environ.get("QA_TIGER_ATTN_V", "stack")
ATTN_ABLATE = os.environ.get("QA_TIGER_ATTN_ABLATE", "")


def _ln(x32, w, b, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * w + b


# ---------------------------------------------------------------------------
# jnp reference (CPU fallback + VJP remat) — must match clip_text.resblock
# ---------------------------------------------------------------------------

def resblock_jnp(params, x, *, heads, mask):
    from qa_tiger_tpu.nn import layer_norm, linear, mha, quick_gelu

    h = layer_norm(params["ln_1"], x)
    attn_out, _ = mha(params["attn"], h, h, h, num_heads=heads,
                      attn_mask=mask, need_weights=False)
    x = x + attn_out
    h = layer_norm(params["ln_2"], x)
    h = linear(params["mlp"]["c_fc"], h)
    h = quick_gelu(h)
    h = linear(params["mlp"]["c_proj"], h)
    return x + h


# ---------------------------------------------------------------------------
# attention half
# ---------------------------------------------------------------------------

def _attn_core(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
               wout_ref, bout_ref, mask_ref, *, heads):
    """x + out_proj(attn(ln_1(x))) on one VMEM block ([r, gS, W])."""
    r, gs, W = x_ref.shape
    hd = W // heads
    scale = 1.0 / math.sqrt(hd)
    dt = x_ref.dtype

    x = x_ref[:]                                          # [r, gS, W]
    h = _ln(x.astype(jnp.float32), lnw_ref[0], lnb_ref[0]).astype(dt)
    h2 = h.reshape(r * gs, W)
    qkv = (jnp.dot(h2, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[0]).astype(dt).reshape(r, gs, 3 * W)
    mask = mask_ref[0]                                    # [gS, gS] fp32
    ctxs = []
    if ATTN_PAIR and heads % 2 == 0:
        gsp = -(-gs // 8) * 8  # pad the stacked blocks to sublane tiles so
        # the row concat lands on an 8-aligned offset (Mosaic legality)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * hd), 2)
        if gsp > gs:
            zrow = [jnp.zeros((r, gsp - gs, 2 * hd), dt)]
            mrow = [jnp.zeros((gsp - gs, gs), mask.dtype)]
        else:
            zrow, mrow = [], []
        mask2 = jnp.concatenate([mask] + mrow + [mask] + mrow, axis=0)
        for hp in range(heads // 2):
            qp = qkv[:, :, 2 * hp * hd:(2 * hp + 2) * hd]  # [r, gs, 2hd]
            kp = qkv[:, :, W + 2 * hp * hd:W + (2 * hp + 2) * hd]
            vp = qkv[:, :, 2 * W + 2 * hp * hd:2 * W + (2 * hp + 2) * hd]
            top = jnp.where(lane < hd, qp, jnp.zeros_like(qp))
            bot = jnp.where(lane >= hd, qp, jnp.zeros_like(qp))
            q2 = jnp.concatenate([top] + zrow + [bot] + zrow, axis=1)
            s = jax.lax.dot_general(
                q2, kp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # [r, 2gsp, gs]
            s = s + mask2
            s = s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            c2 = jax.lax.dot_general(
                p, vp, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt)
            ctxs.append(c2[:, :gs, :hd])                   # head 2hp
            ctxs.append(c2[:, gsp:gsp + gs, hd:])          # head 2hp+1
        ctx = jnp.concatenate(ctxs, axis=-1).reshape(r * gs, W)
        out = (jnp.dot(ctx, wout_ref[:],
                       preferred_element_type=jnp.float32)
               + bout_ref[0]).astype(dt).reshape(r, gs, W)
        return x + out
    if ATTN_V == "stack":
        # all heads' scores row-stacked (each padded to the 8-sublane
        # boundary so slices back out stay aligned); the softmax then runs
        # as ONE VPU chain over the stacked block instead of 12 serialized
        # per-head chains (measured: 1.918 -> 1.863 ms/layer AND Mosaic
        # compile 594 -> 58 s — the per-head softmax chains were what blew
        # up both). Folding the mask add into the stacked block too was a
        # measured LOSS (1.893 ms, compile back to 286 s) — keep it
        # per-head, where it fuses into the score dot's epilogue.
        gsp = -(-gs // 8) * 8
        blocks = []
        for head in range(heads):
            q = qkv[:, :, head * hd:(head + 1) * hd]
            k = qkv[:, :, W + head * hd:W + (head + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale + mask
            if gsp > gs:
                s = jnp.concatenate(
                    [s, jnp.zeros((r, gsp - gs, gs), s.dtype)], axis=1)
            blocks.append(s)
        sall = jnp.concatenate(blocks, axis=1)        # [r, heads*gsp, gS]
        sall = sall - jax.lax.stop_gradient(
            jnp.max(sall, axis=-1, keepdims=True))
        e = jnp.exp(sall)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        for head in range(heads):
            v = qkv[:, :, 2 * W + head * hd:2 * W + (head + 1) * hd]
            ph = p[:, head * gsp:head * gsp + gs, :]
            ctxs.append(jax.lax.dot_general(
                ph, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt))
        ctx = jnp.concatenate(ctxs, axis=-1).reshape(r * gs, W)
        out = (jnp.dot(ctx, wout_ref[:],
                       preferred_element_type=jnp.float32)
               + bout_ref[0]).astype(dt).reshape(r, gs, W)
        return x + out
    for head in range(heads):
        q = qkv[:, :, head * hd:(head + 1) * hd]
        k = qkv[:, :, W + head * hd:W + (head + 1) * hd]
        v = qkv[:, :, 2 * W + head * hd:2 * W + (head + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [r, gS, gS]
        s = s + mask
        if ATTN_ABLATE == "nosoftmax":  # ablation: price the softmax chain
            p = (s * (1.0 / gs)).astype(dt)
        else:
            s = s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctxs.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
    ctx = jnp.concatenate(ctxs, axis=-1).reshape(r * gs, W)
    out = (jnp.dot(ctx, wout_ref[:], preferred_element_type=jnp.float32)
           + bout_ref[0]).astype(dt).reshape(r, gs, W)
    return x + out


def _attn_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                 wout_ref, bout_ref, mask_ref, y_ref, *, heads):
    y_ref[:] = _attn_core(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                          wout_ref, bout_ref, mask_ref, heads=heads)


def _attn_ln2_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wout_ref, bout_ref, ln2w_ref, ln2b_ref, mask_ref,
                     y_ref, h2_ref, *, heads):
    """Attention half + the MLP half's ln_2 input in one pass: emitting
    ln_2(y) here removes the separate convert_reduce round trip that the
    round-2 device traces priced at ~0.5 ms/layer."""
    y = _attn_core(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                   wout_ref, bout_ref, mask_ref, heads=heads)
    y_ref[:] = y
    h2_ref[:] = _ln(y.astype(jnp.float32), ln2w_ref[0],
                    ln2b_ref[0]).astype(y.dtype)


def _attn_sizes(B, S, W, itemsize, outs=1):
    """(g elements per packed score matrix, r packed problems per grid step).

    g follows the round-2b measurement (ops/pallas/attention.py:_wide_sizes):
    packing is a real HBM shuffle and only pays for SHORT sequences, so
    S >= 48 keeps g=1. (The 2.67 ms/layer negative result in the module
    docstring was measured at g=4/r=2 BEFORE that finding; the g=1 attn half
    is what clip_text.resblock routes through now — see fused_attn_ln2.)

    ``outs``: output blocks per grid step (2 when ln_2(y) is emitted too)."""
    if S >= 48:
        g = 1
    else:
        g = max(1, min(B, 384 // S))
        while B % g:
            g -= 1
    weights = 4 * W * W * itemsize
    per_r = (g * S * W * itemsize * (2 + 2 * outs + 3 + 1 + 1)  # x/y dbuf,
             + g * g * S * S * 4 * 2)               # qkv, ctx, fp32 scores
    # admission stays at the DEFAULT-limit budget so the set of shapes that
    # fuse is unchanged (the wide image towers keep their measured-better
    # attention_wide route); only r is sized against the raised limit
    if weights + per_r > VMEM_TOTAL:
        return None
    r = max(1, min(B // g, ATTN_R, (ATTN_VMEM - weights) // max(per_r, 1)))
    while (B // g) % r:
        r -= 1
    return g, r


def _attn_compiler_kwargs(interpret):
    if _HAVE_PLTPU and not interpret:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=ATTN_VMEM_LIMIT)}
    return {}


def _attn_impl(x, params, mask, *, heads, interpret):
    B, S, W = x.shape
    dt = x.dtype
    sizes = _attn_sizes(B, S, W, dt.itemsize)
    if sizes is None:
        if interpret:            # no VMEM limit in interpret mode (tests)
            sizes = (1, B)
        else:
            from qa_tiger_tpu.nn import layer_norm, mha

            h = layer_norm(params["ln_1"], x)
            attn_out, _ = mha(params["attn"], h, h, h, num_heads=heads,
                              attn_mask=mask, need_weights=False)
            return x + attn_out
    g, r = sizes
    attn = params["attn"]
    wqkv = attn["in_proj_weight"].T.astype(dt)            # [W, 3W]
    bqkv = attn["in_proj_bias"][None].astype(jnp.float32)
    wout = attn["out_proj"]["weight"].T.astype(dt)        # [W, W]
    bout = attn["out_proj"]["bias"][None].astype(jnp.float32)
    lnw = params["ln_1"]["weight"][None].astype(jnp.float32)
    lnb = params["ln_1"]["bias"][None].astype(jnp.float32)

    block_diag = jnp.kron(jnp.eye(g, dtype=jnp.float32),
                          jnp.ones((S, S), jnp.float32)) > 0.5
    base = jnp.where(block_diag, 0.0, -jnp.inf).astype(jnp.float32)
    if mask is not None:
        base = base + jnp.where(
            jnp.isneginf(base), 0.0,
            jnp.tile(mask.astype(jnp.float32), (g, g)))

    xp = x.reshape(B // g, g * S, W)
    n = (B // g) // r
    w_args = [lnw, lnb, wqkv, bqkv, wout, bout]
    w_specs = [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
               for w in w_args]
    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads),
        **_attn_compiler_kwargs(interpret),
        out_shape=jax.ShapeDtypeStruct((B // g, g * S, W), dt),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((r, g * S, W), lambda i: (i, 0, 0)),
                *w_specs,
                pl.BlockSpec((1, g * S, g * S), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((r, g * S, W), lambda i: (i, 0, 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * W * 4 * W + 4 * B * g * S * S * W,
            bytes_accessed=2 * x.size * dt.itemsize
            + (B // (g * r)) * 4 * W * W * dt.itemsize,
            transcendentals=B * g * S * S,
        ),
    )(xp, *w_args, base[None])
    return out.reshape(B, S, W)


def _attn_ln2_impl(x, params, mask, *, heads, interpret):
    """(y, ln_2(y)) with the attention half fused; jnp fallback pair when
    the shapes don't fit scoped VMEM."""
    from qa_tiger_tpu.nn import layer_norm

    B, S, W = x.shape
    dt = x.dtype
    sizes = _attn_sizes(B, S, W, dt.itemsize, outs=2)
    if sizes is None:
        if interpret:            # no VMEM limit in interpret mode (tests)
            sizes = (1, B)
        else:
            y = _attn_half_jnp(params, x, heads=heads, mask=mask)
            return y, layer_norm(params["ln_2"], y)
    g, r = sizes
    attn = params["attn"]
    wqkv = attn["in_proj_weight"].T.astype(dt)            # [W, 3W]
    bqkv = attn["in_proj_bias"][None].astype(jnp.float32)
    wout = attn["out_proj"]["weight"].T.astype(dt)        # [W, W]
    bout = attn["out_proj"]["bias"][None].astype(jnp.float32)
    lnw = params["ln_1"]["weight"][None].astype(jnp.float32)
    lnb = params["ln_1"]["bias"][None].astype(jnp.float32)
    ln2w = params["ln_2"]["weight"][None].astype(jnp.float32)
    ln2b = params["ln_2"]["bias"][None].astype(jnp.float32)

    block_diag = jnp.kron(jnp.eye(g, dtype=jnp.float32),
                          jnp.ones((S, S), jnp.float32)) > 0.5
    base = jnp.where(block_diag, 0.0, -jnp.inf).astype(jnp.float32)
    if mask is not None:
        base = base + jnp.where(
            jnp.isneginf(base), 0.0,
            jnp.tile(mask.astype(jnp.float32), (g, g)))

    xp = x.reshape(B // g, g * S, W)
    n = (B // g) // r
    w_args = [lnw, lnb, wqkv, bqkv, wout, bout, ln2w, ln2b]
    w_specs = [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
               for w in w_args]
    io_spec = pl.BlockSpec((r, g * S, W), lambda i: (i, 0, 0))
    y, h2 = pl.pallas_call(
        functools.partial(_attn_ln2_kernel, heads=heads),
        **_attn_compiler_kwargs(interpret),
        out_shape=(jax.ShapeDtypeStruct((B // g, g * S, W), dt),
                   jax.ShapeDtypeStruct((B // g, g * S, W), dt)),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                io_spec,
                *w_specs,
                pl.BlockSpec((1, g * S, g * S), lambda i: (0, 0, 0)),
            ],
            out_specs=(io_spec, io_spec)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * W * 4 * W + 4 * B * g * S * S * W,
            bytes_accessed=3 * x.size * dt.itemsize
            + (B // (g * r)) * 4 * W * W * dt.itemsize,
            transcendentals=B * g * S * S,
        ),
    )(xp, *w_args, base[None])
    return y.reshape(B, S, W), h2.reshape(B, S, W)


# ---------------------------------------------------------------------------
# MLP half
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, lnw_ref, lnb_ref, wfc_ref, bfc_ref,
                wpj_ref, bpj_ref, y_ref, *, chunks):
    """Both weight matrices stay VMEM-resident (constant block index); the
    hidden dim is processed in `chunks` slices INSIDE the kernel so the fp32
    [rows, 4W/chunks] dot output never exceeds the budget. Dots are
    bf16-in/fp32-accumulate (Mosaic requires fp32 dot outputs), rounded to
    the activation dtype at the same points nn.core.linear rounds."""
    dt = x_ref.dtype
    r, s, W = x_ref.shape
    rows = r * s
    x = x_ref[:]
    h = _ln(x.astype(jnp.float32), lnw_ref[0],
            lnb_ref[0]).astype(dt).reshape(rows, W)
    hc = wfc_ref.shape[1] // chunks
    acc = None
    for c in range(chunks):
        hid32 = (jnp.dot(h, wfc_ref[:, c * hc:(c + 1) * hc],
                         preferred_element_type=jnp.float32)
                 + bfc_ref[0, c * hc:(c + 1) * hc])
        # QuickGELU on the fp32 dot output: Mosaic's bf16 `logistic`
        # lowering emits an f32->bf16 vector.broadcast that fails to verify,
        # so the sigmoid must run in fp32 (also slightly more accurate)
        hid = (hid32 * jax.nn.sigmoid(1.702 * hid32)).astype(dt)
        part = jnp.dot(hid, wpj_ref[c * hc:(c + 1) * hc, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out = (acc + bpj_ref[0]).astype(dt).reshape(r, s, W)
    y_ref[:] = x + out


def _mlp_sizes(B, S, W, itemsize):
    """(rows per grid step r, hidden chunks n_h) or None when unfusable.

    Both weight matrices always stay fully VMEM-resident (constant block
    index — Pallas never re-fetches them); `chunks` only slices the hidden
    dim INSIDE the kernel so the fp32 dot output stays under budget, which
    frees VMEM for more rows per grid step."""
    hidden = 4 * W
    weights = 2 * W * hidden * itemsize
    if weights > VMEM_TOTAL - 2 * 1024 * 1024:
        return None
    best = None
    for chunks in (1, 2, 4):
        if hidden % (chunks * 128):
            continue
        hc = hidden // chunks
        # per row: x+y (double-buffered), ln fp32 temp, fp32 chunk dot
        # output + its bf16 cast, fp32 partial-sum accumulator
        per_row = (W * itemsize * 4 + W * 4
                   + hc * (4 + itemsize) + W * 4 * min(chunks - 1, 1))
        r = (VMEM_TOTAL - weights) // max(per_row * S, 1)
        if r < 1:
            continue
        r = min(B, 8, r)
        while B % r:
            r -= 1
        if best is None or r * S > best[0] * S:
            best = (r, chunks)
        if r >= 8 or r * S >= 512:
            break  # rows already MXU-efficient; fewer chunks preferred
    return best


def _mlp_impl(x, params, *, interpret):
    B, S, W = x.shape
    dt = x.dtype
    sizes = _mlp_sizes(B, S, W, dt.itemsize)
    if sizes is None:
        if interpret:            # no VMEM limit in interpret mode (tests)
            sizes = (B, 1)
        else:
            from qa_tiger_tpu.nn import layer_norm, linear, quick_gelu

            h = layer_norm(params["ln_2"], x)
            h = linear(params["mlp"]["c_fc"], h)
            return x + linear(params["mlp"]["c_proj"], quick_gelu(h))
    r, chunks = sizes
    hidden = params["mlp"]["c_fc"]["weight"].shape[0]
    wfc = params["mlp"]["c_fc"]["weight"].T.astype(dt)     # [W, 4W]
    bfc = params["mlp"]["c_fc"]["bias"][None].astype(jnp.float32)
    wpj = params["mlp"]["c_proj"]["weight"].T.astype(dt)   # [4W, W]
    bpj = params["mlp"]["c_proj"]["bias"][None].astype(jnp.float32)
    lnw = params["ln_2"]["weight"][None].astype(jnp.float32)
    lnb = params["ln_2"]["bias"][None].astype(jnp.float32)

    n = B // r
    w_args = [lnw, lnb, wfc, bfc, wpj, bpj]
    w_specs = [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
               for w in w_args]
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, chunks=chunks),
        out_shape=jax.ShapeDtypeStruct((B, S, W), dt),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((r, S, W), lambda i: (i, 0, 0)),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((r, S, W), lambda i: (i, 0, 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * W * 2 * hidden,
            bytes_accessed=2 * x.size * dt.itemsize
            + 2 * W * hidden * dt.itemsize,
            transcendentals=B * S * hidden,
        ),
    )(x, *w_args)
    return out


# ---------------------------------------------------------------------------
# dispatch + VJP
# ---------------------------------------------------------------------------

def _on_tpu(x) -> bool:
    from qa_tiger_tpu.ops.pallas.gaussian_moe import _on_tpu as impl

    return impl(x)


def _usable(x, heads, interpret) -> bool:
    if not _HAVE_PLTPU:
        return False
    B, S, W = x.shape
    if W % heads or W % 128 or S > 1024:
        return False
    if interpret is None:
        # below ~4k rows the launch overhead loses to XLA's fused matmuls
        return B * S >= 4096 and _on_tpu(x)
    return True


def _forward(x, params, mask, heads, interpret):
    if not _usable(x, heads, interpret):
        return resblock_jnp(params, x, heads=heads, mask=mask)
    ipret = bool(interpret)
    y = _attn_impl(x, params, mask, heads=heads, interpret=ipret)
    return _mlp_impl(y, params, interpret=ipret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_resblock(x, params, mask, heads: int,
                   interpret: Optional[bool] = None):
    """One CLIP resblock, both halves fused (x [B, S, W] -> [B, S, W]).

    ``mask`` is an additive [S, S] attention mask or None (treated as a
    constant — no cotangent). Falls back to the jnp formulation off-TPU or
    when shapes don't fit the kernel."""
    return _forward(x, params, mask, heads, interpret)


def _fwd(x, params, mask, heads, interpret):
    return _forward(x, params, mask, heads, interpret), (x, params, mask)


def _bwd(heads, interpret, res, g):
    x, params, mask = res
    _, vjp = jax.vjp(
        lambda x_, p_: resblock_jnp(p_, x_, heads=heads, mask=mask),
        x, params)
    dx, dp = vjp(g)
    return dx, dp, None


fused_resblock.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# attention half ONLY (the round-3 routed form): ln_1 + qkv + heads-in-lanes
# attention + out_proj + residual fused at g=1, the MLP half left to XLA
# (whose own fusion measured FASTER than the fused MLP kernel above).
# Directly attacks the ~1.0 ms/layer LayerNorm-chain HBM traffic the round-2
# device traces attribute to the text tower (docs/PROFILE.md).
# ---------------------------------------------------------------------------

def _attn_half_jnp(params, x, *, heads, mask):
    from qa_tiger_tpu.nn import layer_norm, mha

    h = layer_norm(params["ln_1"], x)
    attn_out, _ = mha(params["attn"], h, h, h, num_heads=heads,
                      attn_mask=mask, need_weights=False)
    return x + attn_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attn_half(x, params, mask, heads: int,
                    interpret: Optional[bool] = None):
    """x + out_proj(attn(ln_1(x))) in one kernel (x [B, S, W]).

    ``params`` is the resblock pytree ('ln_1' + 'attn' keys used). Falls
    back to the jnp formulation off-TPU / when shapes don't fit."""
    if not _usable(x, heads, interpret):
        return _attn_half_jnp(params, x, heads=heads, mask=mask)
    return _attn_impl(x, params, mask, heads=heads,
                      interpret=bool(interpret))


def _ah_fwd(x, params, mask, heads, interpret):
    return fused_attn_half(x, params, mask, heads, interpret), \
        (x, params, mask)


def _ah_bwd(heads, interpret, res, g):
    # mask gets a real cotangent when it is an array: a None cotangent for
    # an array primal breaks custom_vjp pytree matching the moment the
    # text tower is unfrozen (encoder_lr), and the additive mask does
    # receive gradient mathematically.
    x, params, mask = res
    if mask is None:
        _, vjp = jax.vjp(
            lambda x_, p_: _attn_half_jnp(p_, x_, heads=heads, mask=None),
            x, params)
        dx, dp = vjp(g)
        return dx, dp, None
    _, vjp = jax.vjp(
        lambda x_, p_, m_: _attn_half_jnp(p_, x_, heads=heads, mask=m_),
        x, params, mask)
    return vjp(g)


fused_attn_half.defvjp(_ah_fwd, _ah_bwd)


def _attn_ln2_jnp(params, x, *, heads, mask):
    from qa_tiger_tpu.nn import layer_norm

    y = _attn_half_jnp(params, x, heads=heads, mask=mask)
    return y, layer_norm(params["ln_2"], y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attn_ln2(x, params, mask, heads: int,
                   interpret: Optional[bool] = None):
    """(y, ln_2(y)) where y = x + out_proj(attn(ln_1(x))) — one kernel.

    The second output feeds the MLP half's first matmul directly, so XLA
    never re-reads y for a standalone LayerNorm. Falls back to the jnp
    formulation off-TPU / when shapes don't fit scoped VMEM."""
    if not _usable(x, heads, interpret):
        return _attn_ln2_jnp(params, x, heads=heads, mask=mask)
    return _attn_ln2_impl(x, params, mask, heads=heads,
                          interpret=bool(interpret))


def _al_fwd(x, params, mask, heads, interpret):
    return fused_attn_ln2(x, params, mask, heads, interpret), \
        (x, params, mask)


def _al_bwd(heads, interpret, res, g):
    x, params, mask = res
    if mask is None:
        _, vjp = jax.vjp(
            lambda x_, p_: _attn_ln2_jnp(p_, x_, heads=heads, mask=None),
            x, params)
        dx, dp = vjp(g)
        return dx, dp, None
    _, vjp = jax.vjp(
        lambda x_, p_, m_: _attn_ln2_jnp(p_, x_, heads=heads, mask=m_),
        x, params, mask)
    return vjp(g)


fused_attn_ln2.defvjp(_al_fwd, _al_bwd)
