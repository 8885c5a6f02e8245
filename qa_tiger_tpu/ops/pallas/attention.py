"""Pallas TPU kernel: fused softmax attention (no probability tensor in HBM).

The framework's sequences are short (77 question tokens, 60 frames, 14
patches), so full [S_q, S_k] score tiles fit comfortably in VMEM — no online
softmax needed. What the fusion buys is HBM traffic: the XLA path writes the
fp32 logits and probabilities ([B, H, Sq, Sk], e.g. 72 MB per text-tower
layer at B=256) out to HBM between ops; here scores never leave VMEM:

    s   = q @ k^T * scale (+ mask)   # MXU, fp32 accum, stays in VMEM
    p   = softmax_fp32(s)            # VPU
    out = p @ v                      # MXU

Used by nn.attention.mha for eval-mode (or dropout-free) attention whose
average weights aren't requested; gradients fall back to the jnp formulation
via custom VJP (rematerialized backward).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False

DEFAULT_BH_TILE = 64  # ~2 MB of VMEM tiles at S=77, dh=64; measured fastest
# on v5e for the text tower's [3072, 77, 64] masked attention (128 OOMs the
# 16 MB scoped vmem at S=77)


def _reference_impl(q, k, v, mask, scale):
    logits = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    bh, sq, dh = q.shape
    s = jax.lax.dot_general(
        q * scale, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [bh, Sq, Sk]
    if mask_ref is not None:
        s = s + mask_ref[0]
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _packed_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, g, sq, sk):
    """Block-diagonal packed attention for tiny sequences.

    A [*, 14, 64] attention problem is hopeless for the MXU (128x128
    systolic tiles) and for the (16, 128) bf16 VMEM tiling — >85% of every
    tile is padding. The caller packs ``g`` batch elements along the
    sequence axis (a free reshape in HBM), so each block row is one
    [g*Sq, dh] x [dh, g*Sk] matmul with a static block-diagonal -inf mask:
    full MXU tiles, and exp(-inf) = 0 keeps the math EXACTLY per-element
    softmax(qk)v. Dots stay in the activation dtype (bf16 in, fp32
    accumulate) — upcasting inputs would force the 4x-slower fp32 MXU mode.
    """
    q = q_ref[:]   # [r, g*Sq, dh]
    k = k_ref[:]   # [r, g*Sk, dh]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # [r, g*Sq, g*Sk]
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * sq, g * sk), 0) // sq
    cols = jax.lax.broadcasted_iota(jnp.int32, (g * sq, g * sk), 1) // sk
    s = jnp.where((rows == cols)[None], s, -jnp.inf)
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
    out = jax.lax.dot_general(
        p, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [r, g*Sq, dh]
    out_ref[:] = out.astype(out_ref.dtype)


# pack so g*max(Sq,Sk) lands near two 128-lane MXU tiles; grid rows = r
PACK_MAX_S = 16
PACK_G = 16
PACK_R = 16


def _packed_pallas_impl(q, k, v, scale, interpret):
    BH, Sq, dh = q.shape
    Sk = k.shape[1]
    g = PACK_G
    pad = (-BH) % (g * PACK_R)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    # free views: consecutive g elements share one packed attention problem
    n_packs = q.shape[0] // g
    qp = q.reshape(n_packs, g * Sq, dh)
    kp = k.reshape(n_packs, g * Sk, dh)
    vp = v.reshape(n_packs, g * Sk, dh)
    n = n_packs // PACK_R
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, g=g, sq=Sq, sk=Sk),
        out_shape=jax.ShapeDtypeStruct((n_packs, g * Sq, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((PACK_R, g * Sq, dh), lambda i: (i, 0, 0)),
                pl.BlockSpec((PACK_R, g * Sk, dh), lambda i: (i, 0, 0)),
                pl.BlockSpec((PACK_R, g * Sk, dh), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((PACK_R, g * Sq, dh), lambda i: (i, 0, 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * g * Sq * Sk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=BH * g * Sq * Sk,
        ),
    )(qp, kp, vp)
    out = out.reshape(-1, Sq, dh)
    return out[:BH] if pad else out


def _pallas_impl(q, k, v, mask, scale, bh_tile, interpret):
    BH, Sq, dh = q.shape
    Sk = k.shape[1]
    if (mask is None and Sq <= PACK_MAX_S and Sk <= PACK_MAX_S
            and BH >= PACK_G * PACK_R):
        return _packed_pallas_impl(q, k, v, scale, interpret)
    tile = min(bh_tile, BH)
    pad = (-BH) % tile
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    n = q.shape[0] // tile

    in_specs = [
        pl.BlockSpec((tile, Sq, dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile, Sk, dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((tile, Sk, dh), lambda i: (i, 0, 0)),
    ]
    args = [q, k, v]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, Sq, Sk), lambda i: (0, 0, 0)))
        args.append(mask[None].astype(jnp.float32))
        kernel = functools.partial(_kernel, scale=scale)
    else:
        kernel = functools.partial(_no_mask_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q.shape[0], Sq, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(n,), in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, Sq, dh), lambda i: (i, 0, 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Sk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=BH * Sq * Sk,
        ),
    )(*args)
    return out[:BH] if pad else out


def _no_mask_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
    _kernel(q_ref, k_ref, v_ref, None, out_ref, scale=scale)


def fused_attention(q: jax.Array,   # [BH, Sq, dh]
                    k: jax.Array,   # [BH, Sk, dh]
                    v: jax.Array,   # [BH, Sk, dh]
                    mask: Optional[jax.Array],  # [Sq, Sk] additive or None
                    scale: float,
                    bh_tile: int = DEFAULT_BH_TILE,
                    interpret: Optional[bool] = None) -> jax.Array:
    """softmax(q k^T scale + mask) v with scores resident in VMEM.

    The mask is treated as a constant (no cotangent), matching how the
    towers use it (causal/None).
    """
    if mask is None:
        return _fa_nomask(q, k, v, scale, bh_tile, interpret)
    return _fa_masked(q, k, v, mask, scale, bh_tile, interpret)


def _wide_body(q, k, v, out_ref, mask, kb, *, heads, scale):
    """Heads-in-lanes packed attention.

    Blocks arrive in the model's dense [r, g*Sq, W] / [r, g*Sk, W] layout
    (W = heads * dh lanes — full VMEM tiles, no transposes, no padded
    [B*H, S, dh] tensors in HBM). Heads are lane-slices; g batch elements
    share one packed score matrix with ``mask`` carrying both the
    block-diagonal -inf structure and any within-element additive mask
    (e.g. causal) — built once outside, constant across the grid. ``mask``
    is None for unpacked (g=1) maskless attention — skipping the all-zero
    block saves ~1 MB of scoped VMEM, the difference between fitting and
    OOMing at the ToMe tower's [60, 5xx, 1024] shapes. ``kb`` is an
    optional per-(element, key) bias (ToMe proportional attention)."""
    r, gsq, W = q.shape
    hd = W // heads
    ctxs = []
    for h in range(heads):
        qh = q[:, :, h * hd:(h + 1) * hd]
        kh = k[:, :, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # [r, gSq, gSk]
        if mask is not None:
            s = s + mask
        if kb is not None:
            s = s + kb[:, None, :]
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        ctxs.append(jax.lax.dot_general(
            p, v[:, :, h * hd:(h + 1) * hd], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_ref.dtype))
    out_ref[:] = jnp.concatenate(ctxs, axis=-1)


def _wide_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, heads, scale):
    _wide_body(q_ref[:], k_ref[:], v_ref[:], out_ref, mask_ref[0], None,
               heads=heads, scale=scale)


def _wide_nomask_kernel(q_ref, k_ref, v_ref, out_ref, *, heads, scale):
    _wide_body(q_ref[:], k_ref[:], v_ref[:], out_ref, None, None,
               heads=heads, scale=scale)


def _wide_kb_kernel(q_ref, k_ref, v_ref, mask_ref, kb_ref, out_ref, *,
                    heads, scale):
    _wide_body(q_ref[:], k_ref[:], v_ref[:], out_ref, mask_ref[0],
               kb_ref[:][:, 0, :], heads=heads, scale=scale)


def _wide_nomask_kb_kernel(q_ref, k_ref, v_ref, kb_ref, out_ref, *,
                           heads, scale):
    _wide_body(q_ref[:], k_ref[:], v_ref[:], out_ref, None,
               kb_ref[:][:, 0, :], heads=heads, scale=scale)


def _wide_sizes(B, Sq, Sk, W, itemsize):
    """Pick (g = elements per packed problem, r = problems per grid step).

    g=1 for medium/long sequences: the pack reshape ([B,S,W] ->
    [B/g,g*S,W]) is NOT free in HBM — S rows pad to 8-sublane tiles, so
    merging them is a real shuffle XLA emits as reshape+copy. Measured on
    v5e at the shipped sizes, unpacked g=1 beats g=2 despite identical MXU
    row utilization (text tower 77/77: 31.5 vs 33.0 ms; avq 60/77: 4.9 vs
    5.9 ms). Packing only pays for short sequences (< 48 rows) where a
    score matmul would waste most of a 128-row tile. r then sizes the grid
    step to the scoped-VMEM budget (blocks double-buffered, scores fp32;
    10 MB keeps the largest measured-working r: 8 for 77/768, 16 for
    60x77/512, while one step more OOMs the 16 MB limit)."""
    if max(Sq, Sk) >= 48:
        g = 1
    else:
        g = max(1, min(B, 256 // max(Sq, Sk)))
        while B % g:
            g -= 1
    budget = 10 * 1024 * 1024
    per_r = (2 * g * (2 * Sq + 2 * Sk) * W * itemsize  # q,k,v,out x2 buf
             + g * g * Sq * Sk * 4)                    # fp32 score tile
    r = max(1, min(B // g, budget // max(per_r, 1)))
    if g > 1:
        r = min(r, 8)
    while (B // g) % r:
        r -= 1
    return g, r


def fused_attention_wide(q: jax.Array,   # [B, Sq, W]  (W = heads*dh, dense)
                         k: jax.Array,   # [B, Sk, W]
                         v: jax.Array,   # [B, Sk, W]
                         mask: Optional[jax.Array],  # [Sq, Sk] additive
                         scale: float,
                         heads: int,
                         interpret: Optional[bool] = None,
                         key_bias: Optional[jax.Array] = None  # [B, Sk]
                         ) -> jax.Array:
    """Multi-head attention without ever materializing per-head layouts.

    The [B*H, S, 64] form the classic kernel wants pads every (16, 128)
    VMEM tile to >2x its payload and costs three transposes in HBM; here
    q/k/v stay [B, S, W] end to end. ``key_bias`` adds a per-(element, key)
    term to the logits (ToMe proportional attention).
    """
    B, Sq, W = q.shape
    Sk = k.shape[1]
    g, r = _wide_sizes(B, Sq, Sk, W, q.dtype.itemsize)
    qp = q.reshape(B // g, g * Sq, W)
    kp = k.reshape(B // g, g * Sk, W)
    vp = v.reshape(B // g, g * Sk, W)
    n = (B // g) // r
    io_specs = [
        pl.BlockSpec((r, g * Sq, W), lambda i: (i, 0, 0)),
        pl.BlockSpec((r, g * Sk, W), lambda i: (i, 0, 0)),
        pl.BlockSpec((r, g * Sk, W), lambda i: (i, 0, 0)),
    ]
    args = [qp, kp, vp]
    need_mask = g > 1 or mask is not None
    if need_mask:
        block_diag = jnp.kron(jnp.eye(g, dtype=jnp.float32),
                              jnp.ones((Sq, Sk), jnp.float32)) > 0.5
        base = jnp.where(block_diag, 0.0, -jnp.inf).astype(jnp.float32)
        if mask is not None:
            base = base + jnp.where(
                jnp.isneginf(base), 0.0,
                jnp.tile(mask.astype(jnp.float32), (g, g)))
        io_specs.append(pl.BlockSpec((1, g * Sq, g * Sk),
                                     lambda i: (0, 0, 0)))
        args.append(base[None])
    if key_bias is not None:
        # [B//g, 1, g*Sk]: the block's last two dims must be divisible by
        # (8, 128) or equal the array dims — a middle singleton makes them
        # equal for any r / Sk
        io_specs.append(pl.BlockSpec((r, 1, g * Sk), lambda i: (i, 0, 0)))
        args.append(
            key_bias.astype(jnp.float32).reshape(B // g, 1, g * Sk))
    kernel_fn = {
        (True, False): _wide_kernel,
        (False, False): _wide_nomask_kernel,
        (True, True): _wide_kb_kernel,
        (False, True): _wide_nomask_kb_kernel,
    }[(need_mask, key_bias is not None)]
    kernel = functools.partial(kernel_fn, heads=heads, scale=scale)
    extra = {}
    if _HAVE_PLTPU and not interpret:
        # the default scoped-vmem limit is 16 MB; v5e has 128 MB of VMEM.
        # Raising it lets Mosaic keep the larger [*, 5xx, 1024] ToMe blocks
        # (and their fp32 score tiles) on-stack instead of failing to compile
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B // g, g * Sq, W), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=io_specs,
            out_specs=pl.BlockSpec((r, g * Sq, W), lambda i: (i, 0, 0))),
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * g * Sq * Sk * W,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * g * Sq * Sk,
        ),
        **extra,
    )(*args)
    return out.reshape(B, Sq, W)


def attention_wide(q, k, v, mask, scale, heads,
                   interpret: Optional[bool] = None,
                   key_bias: Optional[jax.Array] = None) -> jax.Array:
    """Dispatcher: wide Pallas kernel on TPU (batch divisible into packs),
    plain einsum reference elsewhere. Differentiable (VJP rematerializes
    through the einsum formulation; mask and key_bias are constants)."""
    B = q.shape[0]
    # below ~4k query rows the fused kernel's launch overhead loses to the
    # plain einsum (measured on v5e: qst-attn/grounding Sq=1 cases)
    enough_work = B * q.shape[1] >= 4096 if interpret is None else True
    usable = (_HAVE_PLTPU and B >= 2 and enough_work
              and (interpret or (interpret is None and _on_tpu(q))))
    if not usable:
        return _wide_reference(q, k, v, mask, scale, heads, key_bias)
    return _aw(q, k, v, mask if mask is not None else None, key_bias,
               scale, heads, bool(interpret))


def _wide_reference(q, k, v, mask, scale, heads, key_bias=None):
    B, Sq, W = q.shape
    Sk = k.shape[1]
    hd = W // heads
    q4 = q.reshape(B, Sq, heads, hd)
    k4 = k.reshape(B, Sk, heads, hd)
    v4 = v.reshape(B, Sk, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    if key_bias is not None:
        logits = logits + key_bias.astype(logits.dtype)[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v4,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return ctx.reshape(B, Sq, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _aw(q, k, v, mask, key_bias, scale, heads, interpret):
    return fused_attention_wide(q, k, v, mask, scale, heads, interpret,
                                key_bias)


def _aw_fwd(q, k, v, mask, key_bias, scale, heads, interpret):
    return fused_attention_wide(q, k, v, mask, scale, heads, interpret,
                                key_bias), (q, k, v, mask, key_bias)


def _aw_bwd(scale, heads, interpret, res, g):
    # mask and key_bias get REAL cotangents when they are arrays: key_bias
    # is log(size) in ToMe proportional attention, and size is itself a
    # differentiable function of the tokens (merge_wavg) — dropping its
    # gradient here would silently zero d/d(size) on TPU while the off-TPU
    # path propagates it. (None primals keep None cotangents.)
    q, k, v, mask, key_bias = res
    diff = [q, k, v] + [x for x in (mask, key_bias) if x is not None]

    def f(*args):
        qq, kk, vv = args[:3]
        rest = list(args[3:])
        m = rest.pop(0) if mask is not None else None
        kb = rest.pop(0) if key_bias is not None else None
        return _wide_reference(qq, kk, vv, m, scale, heads, kb)

    _, vjp = jax.vjp(f, *diff)
    grads = list(vjp(g))
    dq, dk, dv = grads[:3]
    rest = grads[3:]
    dmask = rest.pop(0) if mask is not None else None
    dkb = rest.pop(0) if key_bias is not None else None
    return dq, dk, dv, dmask, dkb


_aw.defvjp(_aw_fwd, _aw_bwd)


def _on_tpu(x) -> bool:
    from qa_tiger_tpu.ops.pallas.gaussian_moe import _on_tpu as impl

    return impl(x)


def _forward(q, k, v, mask, scale, bh_tile, interpret):
    if not _HAVE_PLTPU:
        return _reference_impl(q, k, v, mask, scale)
    if interpret is None:
        if not _on_tpu(q):
            return _reference_impl(q, k, v, mask, scale)
        interpret = False
    return _pallas_impl(q, k, v, mask, scale, bh_tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fa_nomask(q, k, v, scale, bh_tile, interpret):
    return _forward(q, k, v, None, scale, bh_tile, interpret)


def _fa_nomask_fwd(q, k, v, scale, bh_tile, interpret):
    return _forward(q, k, v, None, scale, bh_tile, interpret), (q, k, v)


def _fa_nomask_bwd(scale, bh_tile, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_impl(q, k, v, None, scale),
                     q, k, v)
    return vjp(g)


_fa_nomask.defvjp(_fa_nomask_fwd, _fa_nomask_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fa_masked(q, k, v, mask, scale, bh_tile, interpret):
    return _forward(q, k, v, mask, scale, bh_tile, interpret)


def _fa_masked_fwd(q, k, v, mask, scale, bh_tile, interpret):
    return _forward(q, k, v, mask, scale, bh_tile, interpret), (q, k, v, mask)


def _fa_masked_bwd(scale, bh_tile, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q, k, v, m: _reference_impl(q, k, v, m, scale),
                     q, k, v, mask)
    return vjp(g)


_fa_masked.defvjp(_fa_masked_fwd, _fa_masked_bwd)
