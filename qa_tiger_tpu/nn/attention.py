"""torch-semantics multi-head attention as a pure function.

This reproduces ``torch.nn.MultiheadAttention`` numerics exactly (the #1
parity risk flagged in SURVEY.md §7): packed qkv in_proj
(``in_proj_weight [3D, D]``, ``in_proj_bias [3D]``), 1/sqrt(head_dim) query
scaling, softmax over keys, dropout on the attention probabilities, output
projection, and head-averaged attention weights as the second return value
(torch's ``need_weights=True, average_attn_weights=True`` default).

Layout: batch-first ``[B, S, D]``. The reference permutes to torch's
seq-first layout purely to satisfy the torch API (e.g.
src/models/modules.py:102-103); the math is layout-independent so we keep the
TPU-friendlier batch-first form and only transpose inside test oracles.

All matmuls run on the MXU with fp32 accumulation; softmax is computed in
fp32 even under bf16 activations.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.nn.core import Params, dropout, linear, matmul_pref


def mha_init(key: jax.Array, d_model: int, dtype=jnp.float32) -> Params:
    """torch ``nn.MultiheadAttention`` default init.

    in_proj_weight: xavier_uniform over the packed [3D, D] matrix;
    in_proj_bias / out_proj.bias: zeros; out_proj.weight: torch Linear default
    (kaiming_uniform a=sqrt(5)) -> uniform(+-1/sqrt(D)).
    """
    k_in, k_out = jax.random.split(key)
    # xavier_uniform on [3D, D]: bound = sqrt(6 / (fan_in + fan_out))
    bound = math.sqrt(6.0 / (3 * d_model + d_model))
    in_proj_weight = jax.random.uniform(
        k_in, (3 * d_model, d_model), dtype, minval=-bound, maxval=bound
    )
    out_bound = 1.0 / math.sqrt(d_model)
    out_weight = jax.random.uniform(
        k_out, (d_model, d_model), dtype, minval=-out_bound, maxval=out_bound
    )
    return {
        "in_proj_weight": in_proj_weight,
        "in_proj_bias": jnp.zeros((3 * d_model,), dtype),
        "out_proj": {
            "weight": out_weight,
            "bias": jnp.zeros((d_model,), dtype),
        },
    }


def mha(params: Params,
        query: jax.Array,  # [B, Sq, D]
        key: jax.Array,    # [B, Sk, D]
        value: jax.Array,  # [B, Sk, D]
        *,
        num_heads: int,
        dropout_p: float = 0.0,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,  # additive [Sq, Sk]
        need_weights: bool = True,
        prob_mask: Optional[jax.Array] = None,  # multiplicative [B,H,Sq,Sk]
        ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns (attn_output [B, Sq, D], head-averaged weights [B, Sq, Sk]).

    ``need_weights=False`` (and no attention dropout active) routes through
    the fused Pallas attention kernel on TPU — probabilities stay in VMEM —
    and returns None for the weights. Numerics are identical either way.

    ``prob_mask`` is an explicit multiplicative post-softmax mask (already
    scaled by 1/(1-p)) replacing the internal dropout sampling — used by
    the train-mode fused kernels, whose forward and backward must consume
    the SAME dropout realization (see ops/pallas/patch_select.py).
    """
    B, Sq, D = query.shape
    Sk = key.shape[1]
    head_dim = D // num_heads
    assert head_dim * num_heads == D, "d_model must divide num_heads"

    # projections accumulate in fp32 on the MXU, then round back to the
    # activation dtype immediately — otherwise q/k/v live as fp32 tensors
    # through the reshapes below and double the HBM traffic under bf16
    dt = query.dtype
    w = params["in_proj_weight"]
    b = params["in_proj_bias"]
    if query is key and key is value:
        # self-attention: one fused [D, 3D] projection keeps the MXU busy
        qkv = (jnp.matmul(query, w.T, preferred_element_type=matmul_pref(dt))
               + b.astype(matmul_pref(dt))).astype(dt)
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
    elif key is value:
        # cross-attention with shared k/v source: fuse the [D, 2D] projection
        q = (jnp.matmul(query, w[:D].T, preferred_element_type=matmul_pref(dt))
             + b[:D].astype(matmul_pref(dt))).astype(dt)
        kv = (jnp.matmul(key, w[D:].T, preferred_element_type=matmul_pref(dt))
              + b[D:].astype(matmul_pref(dt))).astype(dt)
        k, v = kv[..., :D], kv[..., D:]
    else:
        w_q, w_k, w_v = w[:D], w[D:2 * D], w[2 * D:]
        b_q, b_k, b_v = b[:D], b[D:2 * D], b[2 * D:]
        q = (jnp.matmul(query, w_q.T, preferred_element_type=matmul_pref(dt))
             + b_q.astype(matmul_pref(dt))).astype(dt)
        k = (jnp.matmul(key, w_k.T, preferred_element_type=matmul_pref(dt))
             + b_k.astype(matmul_pref(dt))).astype(dt)
        v = (jnp.matmul(value, w_v.T, preferred_element_type=matmul_pref(dt))
             + b_v.astype(matmul_pref(dt))).astype(dt)

    scale = 1.0 / math.sqrt(head_dim)

    if prob_mask is None and not need_weights \
            and (not train or dropout_p == 0.0 or rng is None):
        # heads-in-lanes kernel: q/k/v stay in their dense [B, S, D] layout
        # (no head transposes, no padded [B*H, S, 64] HBM tensors)
        from qa_tiger_tpu.ops.pallas.attention import attention_wide

        ctx = attention_wide(q, k, v, attn_mask, scale, num_heads)
        return linear(params["out_proj"], ctx), None

    # heads stay where the lane split puts them ([B, S, H, hd], a free
    # reshape) and the einsums carry the head dim via dot_general batch
    # dimensions — materializing [B, H, S, hd] with an explicit transpose
    # forces XLA to emit real HBM layout copies of q/k/v AND their
    # gradients (measured: the [1920,14,8,64] copies were the largest op
    # class of the whole train step)
    q = q.reshape(B, Sq, num_heads, head_dim)
    k = k.reshape(B, Sk, num_heads, head_dim)
    v = v.reshape(B, Sk, num_heads, head_dim)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if attn_mask is not None:
        logits = logits + attn_mask.astype(logits.dtype)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if prob_mask is not None:
        probs_dropped = probs * prob_mask.astype(probs.dtype)
    else:
        probs_dropped = dropout(rng, probs, dropout_p, train)

    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs_dropped.astype(v.dtype), v,
        preferred_element_type=matmul_pref(dt),
    ).astype(dt)
    ctx = ctx.reshape(B, Sq, D)
    out = linear(params["out_proj"], ctx)

    avg_weights = jnp.mean(probs, axis=1).astype(query.dtype)  # [B, Sq, Sk]
    return out, avg_weights
