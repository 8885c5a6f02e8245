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

Eval-path only (train mode has dropout on attention probabilities and after
the cross attention — the jnp path in models/modules.py handles it, and the
custom VJP below rematerializes through that path for gradients).
"""
from __future__ import annotations

import functools
import math
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


def _ln(x32, w, b, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * w + b


def _packed_heads_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype):
    """Per-head block-diagonal packed attention, everything in registers.

    q2d [G*sq, D], k2d/v2d [G*sk, D] where G frames are packed along rows.
    Rows r belong to frame r // sq (cols c // sk); cross-frame logits get
    -inf. Returns [G*sq, D] context (heads re-concatenated along lanes).
    """
    D = q2d.shape[-1]
    hd = D // heads
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (q2d.shape[0], k2d.shape[0]), 0) // sq
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (q2d.shape[0], k2d.shape[0]), 1) // sk
    same = rows == cols
    ctxs = []
    for h in range(heads):
        qh = q2d[:, h * hd:(h + 1) * hd]
        kh = k2d[:, h * hd:(h + 1) * hd]
        vh = v2d[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(same, s, -jnp.inf)
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctxs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32)
                    .astype(dtype))
    return jnp.concatenate(ctxs, axis=-1)


def _bdq_heads_attn(q2d, k2d, v2d, *, heads, sq, sk, scale, dtype):
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
    slf = _packed_heads_attn(qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:],
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
