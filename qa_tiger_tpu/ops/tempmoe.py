"""Fused Gaussian-expert temporal aggregation (the QA-TIGER core op).

The reference computes this with python loops (per-expert MLP loop at
src/models/modules.py:590,598,607; per-topK Gaussian loop at 445-469; per-topK
bmm loop at 517-523). Here the whole op is closed-form vectorized XLA:

  1. every expert MLP runs as one batched einsum over stacked weights
     ``[E, D, H]`` / ``[E, H, D]`` (MXU-friendly: one big matmul instead of E
     small ones),
  2. Gaussian temporal masks for the selected top-K experts come from a single
     broadcasted expression,
  3. the gate-probability mix and the per-expert temporal sum are algebraically
     fused into one combined weight tensor ``w[b, e, t]`` (exact because both
     reductions are linear), so the output is a single einsum
     ``w[b,e,t] * expert_out[b,t,e,d] -> out[b,d]``.

Numerics match the reference exactly (fp32 tolerance):
- base centers ``linspace(margin, 1-margin, E)`` are re-derived from
  ``n_experts``; they are a non-checkpointed buffer in the reference
  (src/models/modules.py:404-408) and must never be loaded from a ckpt,
- center offset = tanh(pred) * margin, width = sigmoid(pred)
  (src/models/modules.py:576-578),
- centers clamped to [0, 1]; width clamped to >= 0.09 then divided by sigma
  (src/models/modules.py:454-457),
- the Gaussian is *peak-normalized* by its own max over T
  (src/models/modules.py:468) — note the 1/(width*sqrt(2pi)) prefactor cancels
  in that normalization, so we skip it entirely,
- top-K gate probabilities renormalized to sum 1 (src/models/modules.py:570).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MIN_WIDTH = 0.09  # reference: src/models/modules.py:457


def gaussian_weights(centers: jax.Array,  # [B, K] already offset-adjusted
                     widths: jax.Array,   # [B, K] sigmoid outputs
                     T: int,
                     sigma: float) -> jax.Array:
    """Peak-normalized Gaussian temporal masks, shape [B, K, T].

    Equivalent to reference generate_gaussian (src/models/modules.py:420-471);
    the 1/(w*sqrt(2pi)) prefactor is dropped because peak normalization
    divides it back out.
    """
    t_axis = jnp.linspace(0.0, 1.0, T, dtype=jnp.float32)  # [T]
    c = jnp.clip(centers, 0.0, 1.0)[..., None]             # [B, K, 1]
    w = (jnp.maximum(widths, MIN_WIDTH) / sigma)[..., None]  # [B, K, 1]
    g = jnp.exp(-jnp.square(t_axis - c) / (2.0 * jnp.square(w)))  # [B, K, T]
    return g / jnp.max(g, axis=-1, keepdims=True)


def gaussian_expert_aggregate(
    expert_out: jax.Array,   # [B, T, E, D] all-expert MLP outputs
    gauss_weight: jax.Array,  # [B, K, T] peak-normalized temporal masks
    topk_inds: jax.Array,    # [B, K] int selected expert ids
    topk_probs: jax.Array,   # [B, K] renormalized gate probabilities
    gather_mode: str = "reference",
) -> jax.Array:
    """Gate-mixed, Gaussian-weighted temporal sum -> [B, D].

    Reproduces reference get_output (src/models/modules.py:473-534): for each
    selected expert k, a Gaussian-weighted sum over T of that expert's output,
    then a topk_probs-weighted mix over K.

    ``gather_mode`` controls which sample's top-K indices pick the experts for
    row (b, t) of the flattened [B*T] batch:

    - ``"reference"`` (default): sample ``(b*T + t) % B``. The reference tiles
      ``topk_inds.repeat(T, 1)`` (src/models/modules.py:502) against a
      ``[B*T = b*T+t]``-ordered reshape (495), so rows gather the routing of a
      *rotated* batch member whenever B > 1. The published checkpoints were
      trained with this behaviour, so checkpoint-parity eval must keep it
      (verified empirically against the torch oracle; equals "paper" when
      B == 1 or when routing agrees across the batch).
    - ``"paper"``: sample ``b`` — the mathematically intended gather
      (repeat_interleave semantics).
    """
    B, T, E, D = expert_out.shape
    K = topk_inds.shape[1]
    if gather_mode == "reference":
        r = (jnp.arange(B)[:, None] * T + jnp.arange(T)[None, :]) % B  # [B,T]
        sel_idx = topk_inds[r]                        # [B, T, K]
    elif gather_mode == "paper":
        sel_idx = jnp.broadcast_to(topk_inds[:, None, :], (B, T, K))
    else:
        raise ValueError(f"unknown gather_mode {gather_mode!r}")
    sel = jnp.take_along_axis(expert_out, sel_idx[..., None], axis=2)  # [B,T,K,D]
    w = (topk_probs[:, :, None] * gauss_weight).astype(expert_out.dtype)  # [B,K,T]
    out = jnp.einsum("bkt,btkd->bd", w, sel, preferred_element_type=jnp.float32)
    return out.astype(expert_out.dtype)


def combined_expert_weights(gauss_weight: jax.Array,  # [B, K, T]
                            topk_inds: jax.Array,     # [B, K]
                            topk_probs: jax.Array,    # [B, K]
                            n_experts: int,
                            gather_mode: str = "reference") -> jax.Array:
    """Fold gate probs, Gaussian masks, and the expert-gather mode into one
    dense weight tensor w[b, e, t] such that

        out[b] = sum_{e,t} w[b,e,t] * MLP_e(x[b,t])

    reproduces ``gaussian_expert_aggregate`` exactly (both reductions are
    linear). This is the input contract of the fused Pallas kernel.
    """
    B, K, T = gauss_weight.shape
    pg = (topk_probs[:, :, None] * gauss_weight).astype(jnp.float32)  # [B,K,T]
    if gather_mode == "paper":
        onehot = jax.nn.one_hot(topk_inds, n_experts, dtype=jnp.float32)
        return jnp.einsum("bke,bkt->bet", onehot, pg,
                          preferred_element_type=jnp.float32)
    if gather_mode == "reference":
        r = (jnp.arange(B)[:, None] * T + jnp.arange(T)[None, :]) % B
        sel_idx = topk_inds[r]                                  # [B, T, K]
        onehot = jax.nn.one_hot(sel_idx, n_experts, dtype=jnp.float32)
        return jnp.einsum("btke,bkt->bet", onehot, pg,
                          preferred_element_type=jnp.float32)
    raise ValueError(f"unknown gather_mode {gather_mode!r}")


def topk_renormalized(router_probs: jax.Array, k: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Top-K gate selection with renormalization (src/models/modules.py:568-570).

    jax.lax.top_k returns values sorted descending, matching torch.topk's
    default ordering.
    """
    topk_probs, topk_inds = jax.lax.top_k(router_probs, k)
    topk_probs = topk_probs / jnp.sum(topk_probs, axis=-1, keepdims=True)
    return topk_probs, topk_inds


def experts_forward(stacked_w1: jax.Array,  # [E, H, D] torch layout [out, in]
                    stacked_b1: jax.Array,  # [E, H]
                    stacked_w2: jax.Array,  # [E, D, H]
                    stacked_b2: jax.Array,  # [E, D]
                    x: jax.Array,           # [B, T, D]
                    ) -> jax.Array:
    """All expert MLPs (Linear-ReLU-Linear) in two batched einsums -> [B, T, E, D]."""
    h = jnp.einsum(
        "btd,ehd->bteh", x, stacked_w1, preferred_element_type=jnp.float32
    ) + stacked_b1
    h = jax.nn.relu(h).astype(x.dtype)
    y = jnp.einsum(
        "bteh,edh->bted", h, stacked_w2, preferred_element_type=jnp.float32
    ) + stacked_b2
    return y.astype(x.dtype)
