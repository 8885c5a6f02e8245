"""Fully-fused PatchSelecter Pallas kernel.

The PatchSelecter (models/modules.py patch_selecter; reference
src/models/modules.py:615-716) is a chain of 7 tensor ops over a
[B*T, P=14, D] batch of tiny per-frame attention problems. Run as separate
XLA ops, every intermediate (qkv, attention contexts, residuals — each
~0.2-0.7 GB at B=256) makes an HBM round trip, and the [*, 14, 64] attention
layouts waste >75% of every (16, 128) VMEM tile; measured on v5e this module
alone costs ~27 ms of the ~72 ms forward.

This kernel runs the ENTIRE module per grid step with everything resident in
VMEM:

    x    = patch block                       [TILE*P, D]   (dense, free view)
    qkv  = x @ W_slf + b                     (one big MXU matmul)
    slf  = per-head block-diagonal packed attention (scores never leave VMEM)
    x    = x + slf @ W_out + b
    kv   = x @ W_kv + b ;  q = [video; audio] @ W_q + b
    crs  = per-head packed cross attention (2 queries/frame over P keys)
    out  = MLP(crs @ W_crs_out + b)
    a/v  = LayerNorm rows -> two [TILE, D] outputs

HBM traffic collapses to: read patch once (+ audio/video queries), stream
weights, write 2 x [B*T, D] — everything else stays on-chip. The packed
attention uses the block-diagonal -inf trick (ops/pallas/attention.py):
cross-frame logits are exp(-inf) = 0, so the math is EXACTLY the reference's
per-frame softmax.

The EVAL kernel's custom VJP rematerializes gradients through the jnp
path (dropout off). TRAIN mode has its own pair of kernels below
(`_kernel_train` / `_kernel_bwd`): the dropout realization arrives as
explicit masks (models.modules.make_patch_dropout_masks) shared by the
fused forward, the hand-written fused backward, and the masked jnp
oracle the tests pin both against.
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

DEFAULT_TILE = 16  # frames per grid step; scores are [TILE*P, TILE*P] fp32
# eval-kernel self attention: heads per score dot (see _headpack_attn).
# Probe knob QA_TIGER_PSEL_HG; read once at import (kernels trace at call).
SELF_HEAD_GROUP = int(os.environ.get("QA_TIGER_PSEL_HG", "1"))
_ABLATE = os.environ.get("QA_TIGER_PSEL_ABLATE", "")  # probe-only knob
# self-attention frame-pack split: 0 = auto (_self_splits), probe override
SELF_COL_SPLIT = int(os.environ.get("QA_TIGER_PSEL_CS", "0"))
# Round-5 probe: route the self-attention's per-head softmax chains through
# ONE row-stacked chain (the resblock stack layout). Opt-in via
# QA_TIGER_PSEL_STACK=1 until the on-chip A/B lands.
SELF_STACK = os.environ.get("QA_TIGER_PSEL_STACK", "0") == "1"


def _self_splits(tile: int, p: int) -> int:
    """Split the self-attention frame pack into 2 row/col chunks when the
    chunks stay sublane-aligned (rows % 8 == 0). Measured on v5e at
    tile=16, P=14: the [224, 224] per-head score block pads to 224x256
    lanes with only 1/16 valid; two [112, 112->128] chunks halve both the
    padded MAC volume and the fp32 s/e/p intermediate traffic —
    standalone eval kernel 9.81 -> 9.08 ms (back-to-back A/B). splits=4/8
    plateau (lane padding floor); head-packing is a measured LOSS (area
    scales with the head group, see _headpack_attn)."""
    n = tile * p
    if tile % 2 == 0 and (n // 2) % 8 == 0:
        return 2
    return 1
# Train fwd/bwd kernel tile (frames per grid step). 16 measured best on the
# round-3 UNSPLIT kernel (8: 17.6 ms, 16: 16.4 ms, 32: 19.9 ms train step at
# B=32). Probe knob QA_TIGER_PSEL_TRAIN_TILE re-ablates now that the chunked
# self-attention splits decouple score AREA from the tile: tile=32 + CS=4
# keeps the [112,112] chunks while doubling the cross-attention streams'
# query rows (16 -> 32 of the MXU's 128).
TRAIN_TILE = int(os.environ.get("QA_TIGER_PSEL_TRAIN_TILE", "16"))


def _ln(x32, w, b, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * w + b


def _tile_keep(keep_h, n_frames):
    """Expand a frame-local keep mask [rows, P] to score geometry
    [rows, n_frames*P]: score column (frame_k*P + ki) reuses lane ki —
    a pure lane concatenation (VPU), no gather."""
    return jnp.concatenate([keep_h] * n_frames, axis=1)


def _split_packed_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype,
                       splits, keep2d=None):
    """_packed_heads_attn with the frame pack SPLIT into `splits` row/col
    chunks per head.

    The packed per-head score block at tile=16, P=14 is [224, 224]: 224
    columns pad to 2 full lane tiles (256) and only the 16 diagonal
    [14, 14] frame blocks are valid (1/16). The on-chip ablations
    (docs/PROFILE.md round 4) show the self-attention cost scales with
    score AREA (VMEM-resident fp32 intermediates + padded MXU tiles), not
    dot count — so two [112, 112->128-lane] chunks halve both the padded
    MAC volume and the s/e/p intermediate traffic at the price of 2x the
    (cheap) dot issues. 112 = 14 sublane tiles, so the row slices stay
    8-aligned. Requires (tile*P) % splits == 0 and tile % splits == 0.
    """
    Q = q2d.shape[0]
    n = Q // splits
    outs = []
    for c in range(splits):
        sl = slice(c * n, (c + 1) * n)
        outs.append(_packed_heads_attn(
            q2d[sl], k2d[sl], v2d[sl], heads=heads, sq=sq, sk=sk,
            scale=scale, dtype=dtype,
            keep2d=None if keep2d is None else keep2d[sl]))
    return jnp.concatenate(outs, axis=0)


def _packed_heads_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype,
                       keep2d=None, _skip_softmax=False):
    """Per-head block-diagonal packed attention, everything in registers.

    q2d [G*sq, D], k2d/v2d [G*sk, D] where G frames are packed along rows.
    Rows r belong to frame r // sq (cols c // sk); cross-frame logits get
    -inf. Returns [G*sq, D] context (heads re-concatenated along lanes).

    keep2d [G*sq, >=heads*sk]: optional multiplicative post-softmax
    dropout masks, lane (h*sk + ki) masking key ki of head h (already
    scaled by 1/(1-p); see models.modules.make_patch_dropout_masks).
    Cross-frame positions have probability exactly 0, so the full-geometry
    expansion is distribution-identical to masking valid entries only.
    """
    D = q2d.shape[-1]
    hd = D // heads
    G = k2d.shape[0] // sk
    Q = q2d.shape[0]
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (Q, k2d.shape[0]), 0) // sq
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (Q, k2d.shape[0]), 1) // sk
    same = rows == cols
    if SELF_STACK and not _skip_softmax and Q % 8 == 0:
        # all heads' masked scores row-stacked through ONE softmax chain
        # (the resblock kernel's round-5 stack layout: merging the per-head
        # fp32 softmax chains measured faster AND cut Mosaic compile 10x
        # there; Q=112/224 rows are already 8-aligned so no pads needed)
        blocks = []
        for h in range(heads):
            s = jax.lax.dot_general(
                q2d[:, h * hd:(h + 1) * hd], k2d[:, h * hd:(h + 1) * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            blocks.append(jnp.where(same, s, -jnp.inf))
        sall = jnp.concatenate(blocks, axis=0)           # [H*Q, G*sk]
        sall = sall - jax.lax.stop_gradient(
            jnp.max(sall, axis=-1, keepdims=True))
        e = jnp.exp(sall)
        pall = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctxs = []
        for h in range(heads):
            p = pall[h * Q:(h + 1) * Q]
            if keep2d is not None:
                keep_h = keep2d[:, h * sk:(h + 1) * sk]
                p = p * _tile_keep(keep_h, G).astype(p.dtype)
            ctxs.append(jnp.dot(p, v2d[:, h * hd:(h + 1) * hd],
                                preferred_element_type=jnp.float32)
                        .astype(dtype))
        return jnp.concatenate(ctxs, axis=-1)
    ctxs = []
    for h in range(heads):
        qh = q2d[:, h * hd:(h + 1) * hd]
        kh = k2d[:, h * hd:(h + 1) * hd]
        vh = v2d[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if _skip_softmax:              # ablation probe only — wrong numerics
            p = jnp.where(same, s * 0.1, 0.0).astype(dtype)
        else:
            s = jnp.where(same, s, -jnp.inf)
            s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        if keep2d is not None:
            keep_h = keep2d[:, h * sk:(h + 1) * sk]
            p = p * _tile_keep(keep_h, G).astype(p.dtype)
        ctxs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32)
                    .astype(dtype))
    return jnp.concatenate(ctxs, axis=-1)


def _headpack_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype, hg,
                   keep2d=None):
    """`hg` heads per score dot, block-diagonal along ROWS.

    The per-head self-attention dots are pure issue overhead at these
    shapes (a [224, 64]x[64, 224] score dot is ~32 ns of MXU compute), so
    the lever is DOT COUNT, not FLOPs. Stacking hg heads' q/k/v row-blocks
    block-diagonally turns 2*heads dots into 2*heads/hg dots at hg^2 the
    (trivial) FLOPs — unlike the full-D query-side packing (_bdq_heads_attn
    applied to self attention), whose score contraction stays D-wide and
    inflates REAL work 8x (the measured loss docs/PROFILE.md records).
    The validity mask is (same frame) AND (same head block); contexts come
    back as row blocks, one per head.

    Row-stacking lane-slices directly trips Mosaic ("offset mismatch on
    non-concat dimension"), so each head's slice is replicated hg-fold
    (consistent offsets) and masked-summed into its row block.
    """
    D = q2d.shape[-1]
    hd = D // heads
    Q, R = q2d.shape[0], k2d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (hg * Q, hg * R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hg * Q, hg * R), 1)
    valid = ((rows % Q) // sq == (cols % R) // sk) \
        & (rows // Q == cols // R)

    def blk(x2d, h0):
        n = x2d.shape[0]
        rb = jax.lax.broadcasted_iota(jnp.int32, (hg * n, hd), 0) // n
        out = jnp.zeros((hg * n, hd), x2d.dtype)
        for j in range(hg):
            sl = x2d[:, (h0 + j) * hd:(h0 + j + 1) * hd]
            out = out + jnp.where(rb == j,
                                  jnp.concatenate([sl] * hg, axis=0),
                                  jnp.zeros_like(sl[0, 0]))
        return out

    ctxs = [None] * heads
    for h0 in range(0, heads, hg):
        qb, kb, vb = blk(q2d, h0), blk(k2d, h0), blk(v2d, h0)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [hg*Q, hg*R]
        s = jnp.where(valid, s, -jnp.inf)
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        if keep2d is not None:
            G = R // sk
            rowb = jax.lax.broadcasted_iota(jnp.int32, (hg * Q, hg * R),
                                            0) // Q
            colb = jax.lax.broadcasted_iota(jnp.int32, (hg * Q, hg * R),
                                            1) // R
            keep_bd = jnp.zeros((hg * Q, hg * R), p.dtype)
            for j in range(hg):
                t = _tile_keep(keep2d[:, (h0 + j) * sk:(h0 + j + 1) * sk], G)
                t_big = jnp.concatenate(
                    [jnp.concatenate([t] * hg, axis=0)] * hg, axis=1)
                keep_bd = keep_bd + jnp.where(
                    (rowb == j) & (colb == j), t_big.astype(p.dtype), 0)
            p = p * keep_bd
        ctx = jnp.dot(p, vb, preferred_element_type=jnp.float32)  # [hg*Q, hd]
        for j in range(hg):
            ctxs[h0 + j] = ctx[j * Q:(j + 1) * Q].astype(dtype)
    return jnp.concatenate(ctxs, axis=-1)


def _bdq_heads_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype,
                    keep2d=None):
    """Query-side block-diagonal packed attention: one dot per stage.

    Same math as `_packed_heads_attn`, but instead of looping heads (2
    MXU ops per head — 16 tiny latency-bound dots for the cross
    attention), the queries are tiled vertically with only head h's lane
    block kept on row block h, so the scores land as ONE [H*Q, R] dot
    (row softmax — no 3D reshape, which Mosaic cannot lower when
    R % 128 != 0) and the context as one [H*Q, R] @ [R, D] dot.  The
    head-h rows of the full-D context then select v's head-h lane block
    via 8 cheap masked adds (VPU).  Measured exact (maxdiff 0.0) and
    ~1 ms faster for the cross half at B=256; a LOSS for the self
    attention, whose 8x score-FLOP inflation ([H*R, D] rows) outweighs
    the pipelining win — keep the loop there.
    """
    Q, D = q2d.shape
    R = k2d.shape[0]
    hd = D // heads
    q_t = jnp.concatenate([q2d] * heads, axis=0)            # [H*Q, D]
    rh = jax.lax.broadcasted_iota(jnp.int32, (heads * Q, D), 0) // Q
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads * Q, D), 1) // hd
    q_bd = jnp.where(rh == ch, q_t, jnp.zeros_like(q_t))
    s = jax.lax.dot_general(
        q_bd, k2d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # [H*Q, R]
    qf = (jax.lax.broadcasted_iota(jnp.int32, (heads * Q, R), 0) % Q) // sq
    kf = jax.lax.broadcasted_iota(jnp.int32, (heads * Q, R), 1) // sk
    s = jnp.where(qf == kf, s, -jnp.inf)
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    if keep2d is not None:
        G = R // sk
        # head h's keep block applies to row block h. A row-axis concat of
        # the per-head tiles trips Mosaic ("offset mismatch on non-concat
        # dimension": each lane-slice keeps its source offset), so build it
        # as a masked sum — adds relayout operands fine.
        rowh = jax.lax.broadcasted_iota(jnp.int32, (heads * Q, R), 0) // Q
        keep_bd = jnp.zeros((heads * Q, R), p.dtype)
        for h in range(heads):
            t = _tile_keep(keep2d[:, h * sk:(h + 1) * sk], G)  # [Q, R]
            t_rep = jnp.concatenate([t] * heads, axis=0)
            keep_bd = keep_bd + jnp.where(rowh == h, t_rep.astype(p.dtype),
                                          0)
        p = p * keep_bd
    ctx_full = jax.lax.dot_general(
        p, v2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [H*Q, D]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, D), 1) // hd
    out = jnp.zeros((Q, D), jnp.float32)
    for h in range(heads):
        out = out + jnp.where(lane == h, ctx_full[h * Q:(h + 1) * Q], 0.0)
    return out.astype(dtype)


def _kernel(patch_ref, video_ref, audio_ref,
            slf_w_ref, slf_b_ref, slf_ow_ref, slf_ob_ref,
            crs_w_ref, crs_b_ref, crs_ow_ref, crs_ob_ref,
            mlp_w1_ref, mlp_b1_ref, mlp_w2_ref, mlp_b2_ref,
            anorm_w_ref, anorm_b_ref, vnorm_w_ref, vnorm_b_ref,
            a_out_ref, v_out_ref, *, tile, p, heads):
    D = patch_ref.shape[-1]
    dt = patch_ref.dtype
    scale = 1.0 / math.sqrt(D // heads)

    x = patch_ref[:]                                     # [tile*P, D]
    # --- self attention over each frame's P patches ---
    qkv = (jnp.dot(x, slf_w_ref[:], preferred_element_type=jnp.float32)
           + slf_b_ref[0]).astype(dt)                    # [tile*P, 3D]
    splits = SELF_COL_SPLIT or _self_splits(tile, p)
    if _ABLATE == "noself":        # probe: whole self-attn block share
        slf = qkv[:, :D]
    elif _ABLATE == "nosoftmax":   # probe: softmax share (wrong numerics)
        slf = _packed_heads_attn(
            qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
            heads=heads, sq=p, sk=p, scale=scale, dtype=dt, _skip_softmax=True)
    elif SELF_HEAD_GROUP > 1:      # probe: measured LOSS, kept as evidence
        slf = _headpack_attn(qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
                             heads=heads, sq=p, sk=p, scale=scale, dtype=dt,
                             hg=SELF_HEAD_GROUP)
    elif splits > 1:
        slf = _split_packed_attn(qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
                                 heads=heads, sq=p, sk=p, scale=scale,
                                 dtype=dt, splits=splits)
    else:
        slf = _packed_heads_attn(
            qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
            heads=heads, sq=p, sk=p, scale=scale, dtype=dt)
    x = x + (jnp.dot(slf, slf_ow_ref[:], preferred_element_type=jnp.float32)
             + slf_ob_ref[0]).astype(dt)

    # --- cross attention: [video; audio] queries over the P patches ---
    q_in = jnp.concatenate([video_ref[:], audio_ref[:]], axis=-1)  # [tile,2D]
    q_in = q_in.reshape(tile * 2, D)  # rows alternate (video, audio) / frame
    crs_w = crs_w_ref[:]                                  # [D, 3D]
    crs_b = crs_b_ref[0]
    q = (jnp.dot(q_in, crs_w[:, :D], preferred_element_type=jnp.float32)
         + crs_b[:D]).astype(dt)                          # [tile*2, D]
    kv = (jnp.dot(x, crs_w[:, D:], preferred_element_type=jnp.float32)
          + crs_b[D:]).astype(dt)                         # [tile*P, 2D]
    ctx = _bdq_heads_attn(q, kv[:, :D], kv[:, D:],
                          heads=heads, sq=2, sk=p, scale=scale, dtype=dt)
    crs = (jnp.dot(ctx, crs_ow_ref[:], preferred_element_type=jnp.float32)
           + crs_ob_ref[0]).astype(dt)                    # [tile*2, D]

    # --- MLP + per-stream LayerNorm ---
    h = jax.nn.relu(jnp.dot(crs, mlp_w1_ref[:],
                            preferred_element_type=jnp.float32)
                    + mlp_b1_ref[0]).astype(dt)
    out = (jnp.dot(h, mlp_w2_ref[:], preferred_element_type=jnp.float32)
           + mlp_b2_ref[0])                               # [tile*2, D] fp32
    out2 = out.reshape(tile, 2, D)
    v_rel, a_rel = out2[:, 0], out2[:, 1]
    a_out_ref[:] = _ln(a_rel, anorm_w_ref[0], anorm_b_ref[0]).astype(dt)
    v_out_ref[:] = _ln(v_rel, vnorm_w_ref[0], vnorm_b_ref[0]).astype(dt)


def _kernel_train(patch_ref, video_ref, audio_ref,
                  mslf_ref, mcrsv_ref, mcrsa_ref, moutv_ref, mouta_ref,
                  slf_w_ref, slf_b_ref, slf_ow_ref, slf_ob_ref,
                  crs_w_ref, crs_b_ref, crs_ow_ref, crs_ob_ref,
                  mlp_w1_ref, mlp_b1_ref, mlp_w2_ref, mlp_b2_ref,
                  anorm_w_ref, anorm_b_ref, vnorm_w_ref, vnorm_b_ref,
                  a_out_ref, v_out_ref, *, tile, p, heads):
    """Train-mode forward: `_kernel` + the explicit dropout masks
    (models.modules.make_patch_dropout_masks geometry).

    Unlike the eval kernel, the video- and audio-query streams of the
    cross attention run separately instead of interleaved into one
    2-token-per-frame block: the [tile, D] + [tile, D] -> [2*tile, D]
    interleave forces Mosaic sublane-offset relayouts (a measured compile
    failure: "offset mismatch on non-concat dimension") and buys nothing —
    each stream is one row per frame either way (sq=1 block-diag)."""
    D = patch_ref.shape[-1]
    dt = patch_ref.dtype
    scale = 1.0 / math.sqrt(D // heads)

    x = patch_ref[:]
    qkv = (jnp.dot(x, slf_w_ref[:], preferred_element_type=jnp.float32)
           + slf_b_ref[0]).astype(dt)
    splits = SELF_COL_SPLIT or _self_splits(tile, p)
    if splits > 1:
        slf = _split_packed_attn(qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
                                 heads=heads, sq=p, sk=p, scale=scale,
                                 dtype=dt, splits=splits, keep2d=mslf_ref[:])
    else:
        slf = _packed_heads_attn(
            qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:], heads=heads,
            sq=p, sk=p, scale=scale, dtype=dt, keep2d=mslf_ref[:])
    x = x + (jnp.dot(slf, slf_ow_ref[:], preferred_element_type=jnp.float32)
             + slf_ob_ref[0]).astype(dt)

    crs_w = crs_w_ref[:]
    crs_b = crs_b_ref[0]
    kv = (jnp.dot(x, crs_w[:, D:], preferred_element_type=jnp.float32)
          + crs_b[D:]).astype(dt)
    kc, vc = kv[:, :D], kv[:, D:]

    def stream(src_ref, mcrs_ref, mout_ref):
        q = (jnp.dot(src_ref[:], crs_w[:, :D],
                     preferred_element_type=jnp.float32)
             + crs_b[:D]).astype(dt)
        ctx = _bdq_heads_attn(q, kc, vc, heads=heads, sq=1, sk=p,
                              scale=scale, dtype=dt, keep2d=mcrs_ref[:])
        crs = (jnp.dot(ctx, crs_ow_ref[:],
                       preferred_element_type=jnp.float32)
               + crs_ob_ref[0]).astype(dt)
        crs = crs * mout_ref[:].astype(dt)
        h = jax.nn.relu(jnp.dot(crs, mlp_w1_ref[:],
                                preferred_element_type=jnp.float32)
                        + mlp_b1_ref[0]).astype(dt)
        return (jnp.dot(h, mlp_w2_ref[:], preferred_element_type=jnp.float32)
                + mlp_b2_ref[0])                          # [tile, D] fp32

    v_rel = stream(video_ref, mcrsv_ref, moutv_ref)
    a_rel = stream(audio_ref, mcrsa_ref, mouta_ref)
    a_out_ref[:] = _ln(a_rel, anorm_w_ref[0], anorm_b_ref[0]).astype(dt)
    v_out_ref[:] = _ln(v_rel, vnorm_w_ref[0], vnorm_b_ref[0]).astype(dt)


def _ln_bwd(x32, w, g, eps=1e-5):
    """d/dx, d/dw, d/db of LayerNorm(x)*w+b given upstream g (all fp32)."""
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


def _kernel_bwd(patch_ref, video_ref, audio_ref,
                mslf_ref, mcrsv_ref, mcrsa_ref, moutv_ref, mouta_ref,
                ga_ref, gv_ref,
                slf_w_ref, slf_b_ref, slf_ow_ref, slf_ob_ref,
                crs_w_ref, crs_b_ref, crs_ow_ref, crs_ob_ref,
                mlp_w1_ref, mlp_b1_ref, mlp_w2_ref, mlp_b2_ref,
                anorm_w_ref, anorm_b_ref, vnorm_w_ref, vnorm_b_ref,
                # outputs: input grads + packed-layout param grads
                gpatch_ref, gvideo_ref, gaudio_ref,
                g_slf_w_ref, g_slf_b_ref, g_slf_ow_ref, g_slf_ob_ref,
                g_crs_w_ref, g_crs_b_ref, g_crs_ow_ref, g_crs_ob_ref,
                g_mlp_w1_ref, g_mlp_b1_ref, g_mlp_w2_ref, g_mlp_b2_ref,
                g_anorm_w_ref, g_anorm_b_ref, g_vnorm_w_ref, g_vnorm_b_ref,
                *, tile, p, heads):
    """Hand-derived backward of `_kernel_train`, one kernel per grid tile.

    Forward intermediates are recomputed in VMEM (they never hit HBM in
    the fused forward, so there is nothing to reload); parameter gradients
    accumulate in fp32 across the sequential grid into constant-index
    output blocks. The AD backward of the XLA-composed path materializes
    every [B*T, P, ...] intermediate AND its gradient in HBM — measured
    8.8 ms of a 17 ms B=32 train step; this keeps all of it on-chip.
    """
    D = patch_ref.shape[-1]
    hd = D // heads
    dt = patch_ref.dtype
    scale = 1.0 / math.sqrt(hd)
    R = tile * p

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (g_slf_w_ref, g_slf_b_ref, g_slf_ow_ref, g_slf_ob_ref,
                    g_crs_w_ref, g_crs_b_ref, g_crs_ow_ref, g_crs_ob_ref,
                    g_mlp_w1_ref, g_mlp_b1_ref, g_mlp_w2_ref, g_mlp_b2_ref,
                    g_anorm_w_ref, g_anorm_b_ref,
                    g_vnorm_w_ref, g_vnorm_b_ref):
            ref[:] = jnp.zeros_like(ref)

    def dot32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dotT_ab(a, b):  # a^T @ b with fp32 accumulation
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_abT(a, b):  # a @ b^T with fp32 accumulation
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---------------- recompute forward ----------------
    x0 = patch_ref[:]                                    # [R, D]
    slf_w = slf_w_ref[:]
    qkv = (dot32(x0, slf_w) + slf_b_ref[0]).astype(dt)
    q1, k1, v1 = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    # chunked like the forward kernels (_self_splits): the per-head score
    # blocks, their softmax intermediates, and the backward's gPd/gS all
    # scale with AREA, so nsp=2 halves the padded tiles and the VMEM-resident
    # prob/pd arrays carried across the cross-attention streams
    nsp = SELF_COL_SPLIT or _self_splits(tile, p)
    ch = R // nsp
    chunks = [slice(c * ch, (c + 1) * ch) for c in range(nsp)]
    rows_l = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0) // p
    cols_l = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1) // p
    same1 = rows_l == cols_l
    mslf = mslf_ref[:]

    P1s = [[None] * nsp for _ in range(heads)]
    Pd1s = [[None] * nsp for _ in range(heads)]
    slf_parts = []
    for h in range(heads):
        hsl = slice(h * hd, (h + 1) * hd)
        ctx_chunks = []
        for c, rs in enumerate(chunks):
            s = dot_abT(q1[rs, hsl], k1[rs, hsl]) * scale
            s = jnp.where(same1, s, -jnp.inf)
            s = s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s)
            prob = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            keep = _tile_keep(mslf[rs, h * p:(h + 1) * p],
                              tile // nsp).astype(prob.dtype)
            pd = prob * keep
            P1s[h][c] = prob
            Pd1s[h][c] = pd
            ctx_chunks.append(dot32(pd, v1[rs, hsl]).astype(dt))
        slf_parts.append(ctx_chunks[0] if nsp == 1
                         else jnp.concatenate(ctx_chunks, axis=0))
    slf = jnp.concatenate(slf_parts, axis=-1)            # [R, D]
    x1 = x0 + (dot32(slf, slf_ow_ref[:]) + slf_ob_ref[0]).astype(dt)

    crs_w = crs_w_ref[:]
    crs_b = crs_b_ref[0]
    kv = (dot32(x1, crs_w[:, D:]) + crs_b[D:]).astype(dt)
    kc, vc = kv[:, :D], kv[:, D:]

    rows2 = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (tile, R), 1) // p
    same2 = rows2 == cols2

    ga = ga_ref[:].astype(jnp.float32)                   # [tile, D]
    gv = gv_ref[:].astype(jnp.float32)

    def stream_fwd_bwd(src_ref, mcrs_ref, mout_ref, norm_w, g_up):
        """Recompute one query stream's forward, backpropagate its half
        (weight grads accumulate into the shared output refs in place).

        Returns (g_src [tile, D], g_kv_contrib [R, 2D],
        g_norm_weight [1, D], g_norm_bias [1, D])."""
        src = src_ref[:]
        mcrs = mcrs_ref[:]
        qc = (dot32(src, crs_w[:, :D]) + crs_b[:D]).astype(dt)
        keeps = [_tile_keep(mcrs[:, h * p:(h + 1) * p], tile)
                 .astype(jnp.float32) for h in range(heads)]
        Ps, Pds, ctx_parts = [], [], []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            s = dot_abT(qc[:, sl], kc[:, sl]) * scale
            s = jnp.where(same2, s, -jnp.inf)
            s = s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s)
            prob = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            pd = prob * keeps[h].astype(dt)
            Ps.append(prob)
            Pds.append(pd)
            ctx_parts.append(dot32(pd, vc[:, sl]).astype(dt))
        ctx = jnp.concatenate(ctx_parts, axis=-1)        # [tile, D]
        crs_o = (dot32(ctx, crs_ow_ref[:]) + crs_ob_ref[0]).astype(dt)
        mout = mout_ref[:].astype(dt)
        crs_d = crs_o * mout
        pre1 = dot32(crs_d, mlp_w1_ref[:]) + mlp_b1_ref[0]
        h1 = jax.nn.relu(pre1).astype(dt)
        out = dot32(h1, mlp_w2_ref[:]) + mlp_b2_ref[0]   # [tile, D] fp32

        g_rel, g_nw, g_nb = _ln_bwd(out, norm_w, g_up)
        g_h1 = dot_abT(g_rel.astype(dt), mlp_w2_ref[:])
        g_mlp_w2_ref[:] += dotT_ab(h1, g_rel.astype(dt))
        g_mlp_b2_ref[:] += jnp.sum(g_rel, axis=0, keepdims=True)
        g_pre1 = jnp.where(pre1 > 0, g_h1, 0.0)
        g_crs_d = dot_abT(g_pre1.astype(dt), mlp_w1_ref[:])
        g_mlp_w1_ref[:] += dotT_ab(crs_d, g_pre1.astype(dt))
        g_mlp_b1_ref[:] += jnp.sum(g_pre1, axis=0, keepdims=True)
        g_crs_o = (g_crs_d * mout).astype(dt)
        g_ctx = dot_abT(g_crs_o, crs_ow_ref[:]).astype(dt)
        g_crs_ow_ref[:] += dotT_ab(ctx, g_crs_o)
        g_crs_ob_ref[:] += jnp.sum(g_crs_o.astype(jnp.float32),
                                   axis=0, keepdims=True)

        g_qc_parts, g_kc_parts, g_vc_parts = [], [], []
        for h in range(heads):
            sl = slice(h * hd, (h + 1) * hd)
            gctx_h = g_ctx[:, sl]
            gPd = dot_abT(gctx_h, vc[:, sl])             # [tile, R]
            g_vc_parts.append(dotT_ab(Pds[h], gctx_h).astype(dt))
            gP = gPd * keeps[h]
            prob = Ps[h].astype(jnp.float32)
            gS = prob * (gP - jnp.sum(gP * prob, axis=-1, keepdims=True))
            gS = gS.astype(dt)
            g_qc_parts.append((dot32(gS, kc[:, sl]) * scale).astype(dt))
            g_kc_parts.append((dotT_ab(gS, qc[:, sl]) * scale).astype(dt))
        g_qc = jnp.concatenate(g_qc_parts, axis=-1)      # [tile, D]
        g_kv_c = jnp.concatenate(
            [jnp.concatenate(g_kc_parts, axis=-1),
             jnp.concatenate(g_vc_parts, axis=-1)], axis=-1)  # [R, 2D]
        g_crs_w_ref[:, :D] += dotT_ab(src, g_qc)
        g_crs_b_ref[:, :D] += jnp.sum(g_qc.astype(jnp.float32),
                                      axis=0, keepdims=True)
        g_src = dot_abT(g_qc, crs_w[:, :D]).astype(dt)
        return g_src, g_kv_c, g_nw, g_nb

    # video stream feeds vnorm/v_out, audio stream anorm/a_out (the eval
    # kernel's out2[:, 0] / out2[:, 1] row split)
    g_video, g_kv_v, g_vw, g_vb = stream_fwd_bwd(
        video_ref, mcrsv_ref, moutv_ref, vnorm_w_ref[0], gv)
    g_audio, g_kv_a, g_aw, g_ab = stream_fwd_bwd(
        audio_ref, mcrsa_ref, mouta_ref, anorm_w_ref[0], ga)
    g_vnorm_w_ref[:] += g_vw
    g_vnorm_b_ref[:] += g_vb
    g_anorm_w_ref[:] += g_aw
    g_anorm_b_ref[:] += g_ab
    gvideo_ref[:] = g_video
    gaudio_ref[:] = g_audio

    g_kv = (g_kv_v.astype(jnp.float32)
            + g_kv_a.astype(jnp.float32)).astype(dt)     # [R, 2D]
    g_x1 = dot_abT(g_kv, crs_w[:, D:]).astype(dt)        # [R, D]
    g_crs_w_ref[:, D:] += dotT_ab(x1, g_kv)
    g_crs_b_ref[:, D:] += jnp.sum(g_kv.astype(jnp.float32),
                                  axis=0, keepdims=True)

    # self-attention half backward
    g_slf = dot_abT(g_x1, slf_ow_ref[:]).astype(dt)      # [R, D]
    g_slf_ow_ref[:] += dotT_ab(slf, g_x1)
    g_slf_ob_ref[:] += jnp.sum(g_x1.astype(jnp.float32),
                               axis=0, keepdims=True)
    g_q_parts, g_k_parts, g_v_parts = [], [], []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        gq_c, gk_c, gv_c = [], [], []
        for c, rs in enumerate(chunks):
            keep = _tile_keep(mslf[rs, h * p:(h + 1) * p],
                              tile // nsp).astype(jnp.float32)
            gslf_h = g_slf[rs, sl]
            gPd = dot_abT(gslf_h, v1[rs, sl])            # [ch, ch]
            gv_c.append(dotT_ab(Pd1s[h][c], gslf_h).astype(dt))
            gP = gPd * keep
            prob = P1s[h][c].astype(jnp.float32)
            gS = prob * (gP - jnp.sum(gP * prob, axis=-1, keepdims=True))
            gS = gS.astype(dt)
            gq_c.append((dot32(gS, k1[rs, sl]) * scale).astype(dt))
            gk_c.append((dotT_ab(gS, q1[rs, sl]) * scale).astype(dt))
        cat = (lambda xs: xs[0] if nsp == 1
               else jnp.concatenate(xs, axis=0))
        g_q_parts.append(cat(gq_c))
        g_k_parts.append(cat(gk_c))
        g_v_parts.append(cat(gv_c))
    g_qkv = jnp.concatenate(
        [jnp.concatenate(g_q_parts, axis=-1),
         jnp.concatenate(g_k_parts, axis=-1),
         jnp.concatenate(g_v_parts, axis=-1)], axis=-1)  # [R, 3D]
    g_slf_w_ref[:] += dotT_ab(x0, g_qkv)
    g_slf_b_ref[:] += jnp.sum(g_qkv.astype(jnp.float32),
                              axis=0, keepdims=True)
    gpatch_ref[:] = (g_x1 + dot_abT(g_qkv, slf_w).astype(dt)).astype(dt)


def _jnp_reference(patch, audio, video, params, *, nhead):
    """Pure-jnp eval-path patch_selecter (used for CPU fallback + VJP)."""
    from qa_tiger_tpu.models import modules as M

    a, v = M.patch_selecter_jnp(params, patch, audio, video, nhead=nhead)
    return a, v


def _pack_params(params):
    """Pre-transpose the torch-layout weights once (outside the kernel)."""
    slf = params["slf_attn"]
    crs = params["crs_attn"]
    mlp = params["mlp"]
    return (
        slf["in_proj_weight"].T, slf["in_proj_bias"],
        slf["out_proj"]["weight"].T, slf["out_proj"]["bias"],
        crs["in_proj_weight"].T, crs["in_proj_bias"],
        crs["out_proj"]["weight"].T, crs["out_proj"]["bias"],
        mlp["0"]["weight"].T, mlp["0"]["bias"],
        mlp["2"]["weight"].T, mlp["2"]["bias"],
        params["anorm"]["weight"], params["anorm"]["bias"],
        params["vnorm"]["weight"], params["vnorm"]["bias"],
    )


def _pallas_impl(patch, audio, video, flat_w, *, nhead, tile, interpret):
    B, T, P, D = patch.shape
    BT = B * T
    dt = patch.dtype
    pad = (-BT) % tile
    patch2d = patch.reshape(BT * P, D)
    audio2d = audio.reshape(BT, D)
    video2d = video.reshape(BT, D)
    if pad:
        patch2d = jnp.pad(patch2d, ((0, pad * P), (0, 0)))
        audio2d = jnp.pad(audio2d, ((0, pad), (0, 0)))
        video2d = jnp.pad(video2d, ((0, pad), (0, 0)))
    n = (BT + pad) // tile

    # biases/norm params go in as [1, N] (Mosaic prefers >=2D blocks); all
    # weights cast to the activation dtype once, outside the grid
    flat_w = tuple((w if w.ndim == 2 else w[None]).astype(dt)
                   for w in flat_w)
    w_specs = [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
               for w in flat_w]
    a_out, v_out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, p=P, heads=nhead),
        out_shape=(jax.ShapeDtypeStruct((BT + pad, D), dt),
                   jax.ShapeDtypeStruct((BT + pad, D), dt)),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((tile * P, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                *w_specs,
            ],
            out_specs=(pl.BlockSpec((tile, D), lambda i: (i, 0)),
                       pl.BlockSpec((tile, D), lambda i: (i, 0)))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * BT * P * D * (3 * D + D + 2 * D + D // 2)
            + 4 * BT * tile * P * P * D,
            bytes_accessed=(patch2d.size + audio2d.size + video2d.size
                            + 2 * BT * D) * dt.itemsize,
            transcendentals=BT * tile * P * P,
        ),
    )(patch2d, video2d, audio2d, *flat_w)
    a_out = a_out[:BT].reshape(B, T, D)
    v_out = v_out[:BT].reshape(B, T, D)
    return a_out, v_out


def _on_tpu(x) -> bool:
    from qa_tiger_tpu.ops.pallas.gaussian_moe import _on_tpu as impl

    return impl(x)


# ---------------------------------------------------------------------------
# Train mode: fused forward + hand-written fused backward with explicit
# dropout masks (models.modules.make_patch_dropout_masks)
# ---------------------------------------------------------------------------

def _pad_rows(x, n):
    return jnp.pad(x, ((0, n), (0, 0))) if n else x


def _train_geometry(patch, audio, video, masks, tile):
    B, T, P, D = patch.shape
    BT = B * T
    pad = (-BT) % tile
    patch2d = _pad_rows(patch.reshape(BT * P, D), pad * P)
    audio2d = _pad_rows(audio.reshape(BT, D), pad)
    video2d = _pad_rows(video.reshape(BT, D), pad)
    m = (_pad_rows(masks["slf"], pad * P),
         _pad_rows(masks["crs_v"], pad),
         _pad_rows(masks["crs_a"], pad),
         _pad_rows(masks["out_v"], pad),
         _pad_rows(masks["out_a"], pad))
    return (B, T, P, D, BT, pad, patch2d, audio2d, video2d, m)


def _mask_specs(tile, P, Lp, D):
    return [
        pl.BlockSpec((tile * P, Lp), lambda i: (i, 0)),
        pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
        pl.BlockSpec((tile, Lp), lambda i: (i, 0)),
        pl.BlockSpec((tile, D), lambda i: (i, 0)),
        pl.BlockSpec((tile, D), lambda i: (i, 0)),
    ]


def _cast_flat_w(flat_w, dt):
    return tuple((w if w.ndim == 2 else w[None]).astype(dt) for w in flat_w)


def _w_specs(flat_w):
    return [pl.BlockSpec(w.shape, lambda i, _n=w.ndim: (0,) * _n)
            for w in flat_w]


def _pallas_train_fwd(patch, audio, video, masks, flat_w,
                      *, nhead, tile, interpret):
    (B, T, P, D, BT, pad, patch2d, audio2d, video2d,
     m) = _train_geometry(patch, audio, video, masks, tile)
    dt = patch.dtype
    Lp = m[0].shape[1]
    n = (BT + pad) // tile
    flat_w = _cast_flat_w(flat_w, dt)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20)
    a_out, v_out = pl.pallas_call(
        functools.partial(_kernel_train, tile=tile, p=P, heads=nhead),
        out_shape=(jax.ShapeDtypeStruct((BT + pad, D), dt),
                   jax.ShapeDtypeStruct((BT + pad, D), dt)),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((tile * P, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                *_mask_specs(tile, P, Lp, D),
                *_w_specs(flat_w),
            ],
            out_specs=(pl.BlockSpec((tile, D), lambda i: (i, 0)),
                       pl.BlockSpec((tile, D), lambda i: (i, 0)))),
        interpret=interpret,
        **kwargs,
    )(patch2d, video2d, audio2d, *m, *flat_w)
    return (a_out[:BT].reshape(B, T, D), v_out[:BT].reshape(B, T, D))


def _pallas_train_bwd(patch, audio, video, masks, flat_w, ga, gv,
                      *, nhead, tile, interpret):
    (B, T, P, D, BT, pad, patch2d, audio2d, video2d,
     m) = _train_geometry(patch, audio, video, masks, tile)
    dt = patch.dtype
    Lp = m[0].shape[1]
    n = (BT + pad) // tile
    flat_w = _cast_flat_w(flat_w, dt)
    ga2d = _pad_rows(ga.reshape(BT, D).astype(dt), pad)
    gv2d = _pad_rows(gv.reshape(BT, D).astype(dt), pad)

    const = lambda i: (0, 0)  # noqa: E731
    gw_shapes, gw_specs = [], []
    for w in flat_w:
        gw_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        gw_specs.append(pl.BlockSpec(w.shape, const))
    out_shape = (
        jax.ShapeDtypeStruct(((BT + pad) * P, D), dt),
        jax.ShapeDtypeStruct((BT + pad, D), dt),
        jax.ShapeDtypeStruct((BT + pad, D), dt),
        *gw_shapes,
    )
    out_specs = (
        pl.BlockSpec((tile * P, D), lambda i: (i, 0)),
        pl.BlockSpec((tile, D), lambda i: (i, 0)),
        pl.BlockSpec((tile, D), lambda i: (i, 0)),
        *gw_specs,
    )
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20)
    res = pl.pallas_call(
        functools.partial(_kernel_bwd, tile=tile, p=P, heads=nhead),
        out_shape=out_shape,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((tile * P, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                *_mask_specs(tile, P, Lp, D),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                pl.BlockSpec((tile, D), lambda i: (i, 0)),
                *_w_specs(flat_w),
            ],
            out_specs=out_specs),
        interpret=interpret,
        **kwargs,
    )(patch2d, video2d, audio2d, *m, ga2d, gv2d, *flat_w)
    gpatch = res[0][:BT * P].reshape(B, T, P, D)
    gvideo = res[1][:BT].reshape(B, T, D)
    gaudio = res[2][:BT].reshape(B, T, D)
    return gpatch, gaudio, gvideo, res[3:]


def _unpack_param_grads(gs, params):
    """Packed-layout kernel gradients -> the params pytree (transposing
    the weight grads back to torch layout, matching leaf dtypes)."""
    (g_slf_w, g_slf_b, g_slf_ow, g_slf_ob,
     g_crs_w, g_crs_b, g_crs_ow, g_crs_ob,
     g_w1, g_b1, g_w2, g_b2, g_anw, g_anb, g_vnw, g_vnb) = gs

    def like(g, ref):
        return g.astype(ref.dtype)

    return {
        "slf_attn": {
            "in_proj_weight": like(g_slf_w.T,
                                   params["slf_attn"]["in_proj_weight"]),
            "in_proj_bias": like(g_slf_b[0],
                                 params["slf_attn"]["in_proj_bias"]),
            "out_proj": {
                "weight": like(g_slf_ow.T,
                               params["slf_attn"]["out_proj"]["weight"]),
                "bias": like(g_slf_ob[0],
                             params["slf_attn"]["out_proj"]["bias"]),
            },
        },
        "crs_attn": {
            "in_proj_weight": like(g_crs_w.T,
                                   params["crs_attn"]["in_proj_weight"]),
            "in_proj_bias": like(g_crs_b[0],
                                 params["crs_attn"]["in_proj_bias"]),
            "out_proj": {
                "weight": like(g_crs_ow.T,
                               params["crs_attn"]["out_proj"]["weight"]),
                "bias": like(g_crs_ob[0],
                             params["crs_attn"]["out_proj"]["bias"]),
            },
        },
        "mlp": {
            "0": {"weight": like(g_w1.T, params["mlp"]["0"]["weight"]),
                  "bias": like(g_b1[0], params["mlp"]["0"]["bias"])},
            "2": {"weight": like(g_w2.T, params["mlp"]["2"]["weight"]),
                  "bias": like(g_b2[0], params["mlp"]["2"]["bias"])},
        },
        "anorm": {"weight": like(g_anw[0], params["anorm"]["weight"]),
                  "bias": like(g_anb[0], params["anorm"]["bias"])},
        "vnorm": {"weight": like(g_vnw[0], params["vnorm"]["weight"]),
                  "bias": like(g_vnb[0], params["vnorm"]["bias"])},
    }


def _jnp_masked(patch, audio, video, params, masks, *, nhead):
    from qa_tiger_tpu.models import modules as M

    a, v = M.patch_selecter_jnp(params, patch, audio, video, nhead=nhead,
                                masks=masks)
    return a, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_patch_select_train(patch, audio, video, params, masks,
                             nhead: int = 8, tile: int = DEFAULT_TILE,
                             interpret: Optional[bool] = None):
    """Train-mode PatchSelecter: fused forward AND fused hand-written
    backward, with the dropout realization passed in as explicit masks so
    both directions (and the jnp oracle) see identical randomness.

    patch [B, T, P, D], audio/video [B, T, D], masks from
    models.modules.make_patch_dropout_masks. Returns (a, v) [B, T, D]."""
    return _forward_train(patch, audio, video, params, masks,
                          nhead, tile, interpret)


def _use_pallas_train(patch, interpret):
    if not _HAVE_PLTPU:
        return False, False
    if interpret is None:
        return _on_tpu(patch), False
    return True, interpret


def _forward_train(patch, audio, video, params, masks, nhead, tile,
                   interpret):
    use, interp = _use_pallas_train(patch, interpret)
    if not use:
        return _jnp_masked(patch, audio, video, params, masks, nhead=nhead)
    return _pallas_train_fwd(patch, audio, video, masks,
                             _pack_params(params),
                             nhead=nhead, tile=tile, interpret=interp)


def _train_fwd_rule(patch, audio, video, params, masks, nhead, tile,
                    interpret):
    out = _forward_train(patch, audio, video, params, masks, nhead, tile,
                         interpret)
    return out, (patch, audio, video, params, masks)


def _train_bwd_rule(nhead, tile, interpret, res, g):
    patch, audio, video, params, masks = res
    ga, gv = g
    use, interp = _use_pallas_train(patch, interpret)
    if not use:
        _, vjp = jax.vjp(
            lambda pt, a, v, pr: _jnp_masked(pt, a, v, pr, masks,
                                             nhead=nhead),
            patch, audio, video, params)
        gpatch, gaudio, gvideo, gparams = vjp((ga, gv))
    else:
        gpatch, gaudio, gvideo, gw = _pallas_train_bwd(
            patch, audio, video, masks, _pack_params(params), ga, gv,
            nhead=nhead, tile=tile, interpret=interp)
        gparams = _unpack_param_grads(gw, params)
    gmasks = jax.tree_util.tree_map(jnp.zeros_like, masks)
    return gpatch, gaudio, gvideo, gparams, gmasks


fused_patch_select_train.defvjp(_train_fwd_rule, _train_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_patch_select(patch, audio, video, params,
                       nhead: int = 8, tile: int = DEFAULT_TILE,
                       interpret: Optional[bool] = None):
    """(a_final, v_final) = PatchSelecter(patch, audio, video), one kernel.

    patch [B, T, P, D], audio/video [B, T, D]; returns two [B, T, D]."""
    return _forward(patch, audio, video, params, nhead, tile, interpret)


def _forward(patch, audio, video, params, nhead, tile, interpret):
    if not _HAVE_PLTPU:
        return _jnp_reference(patch, audio, video, params, nhead=nhead)
    if interpret is None:
        if not _on_tpu(patch):
            return _jnp_reference(patch, audio, video, params, nhead=nhead)
        interpret = False
    return _pallas_impl(patch, audio, video, _pack_params(params),
                        nhead=nhead, tile=tile, interpret=interpret)


def _fwd(patch, audio, video, params, nhead, tile, interpret):
    out = _forward(patch, audio, video, params, nhead, tile, interpret)
    return out, (patch, audio, video, params)


def _bwd(nhead, tile, interpret, res, g):
    patch, audio, video, params = res
    _, vjp = jax.vjp(
        lambda pt, a, v, p: _jnp_reference(pt, a, v, p, nhead=nhead),
        patch, audio, video, params)
    return vjp(g)


fused_patch_select.defvjp(_fwd, _bwd)
