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

DEFAULT_BH_TILE = 32  # ~1 MB of VMEM tiles at S=77, dh=64; amortizes grid overhead


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


def _pallas_impl(q, k, v, mask, scale, bh_tile, interpret):
    BH, Sq, dh = q.shape
    Sk = k.shape[1]
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
    _, vjp = jax.vjp(lambda q, k, v: _reference_impl(q, k, v, mask, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None  # mask is constant


_fa_masked.defvjp(_fa_masked_fwd, _fa_masked_bwd)
