"""TSPM baseline (CVPR'24 "Temporal-Spatial Perception Model"), JAX edition.

Architecture parity with the reference reimplementation
(reference: src/models/tspm.py:309-400):

  input Linears -> AV_Attn (1x AVHanLayer, nhead=1) -> TemporalPerception
  (question-PROMPT-as-query discrete top-K frame selection) ->
  SpatioPerception (audio-guided patch attention over the selected frames) ->
  QstTemporalGrounding -> 6-way concat [B, 3072] -> tanh -> Linear(3072, 512)
  -> elementwise mul with question -> tanh -> Linear(512, num_labels).

TPU re-design notes:
- the reference's per-batch python gather loops (SelectTopK at
  src/models/tspm.py:124-134, TopKSegs at 246-259) become
  ``jnp.take_along_axis`` over statically-shaped top-K index tensors
  (argsort -> slice -> sort, all fixed shapes, jit-safe),
- TemporalPerception keeps the reference's *discrete* (non-differentiable)
  frame selection semantics — gradients flow through the attention weights
  only via the selected values, exactly like torch's indexing,
- TSPM expects precomputed question + prompt features (the reference's
  integer-token branch references a nonexistent quest_encoder,
  src/models/tspm.py:359-378 — a dead path we do not reproduce).

The reference's unused ``TSPM_topKSelection`` block in modules.py:720-850 is
functionally subsumed by ``temporal_perception`` here.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.nn import (
    dropout,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mha,
    mha_init,
    next_rng,
)

Params = dict


def tspm_config(topK: int = 10, audio_dim: int = 128, vis_dim: int = 768,
                patch_dim: int = 1024, qst_dim: int = 768,
                hidden_size: int = 512, num_labels: int = 42,
                avq_cross_attn: bool = False, **_unused) -> dict:
    return dict(topK=topK, audio_dim=audio_dim, vis_dim=vis_dim,
                patch_dim=patch_dim, qst_dim=qst_dim,
                hidden_size=hidden_size, num_labels=num_labels,
                avq_cross_attn=avq_cross_attn, dropout=0.1)


def _ffn_block_init(key: jax.Array, d: int, d_ff: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "qst_query_linear1": linear_init(k1, d, d_ff),
        "qst_query_linear2": linear_init(k2, d_ff, d),
        "qst_query_visual_norm": layer_norm_init(d),
    }


def _attn_ffn_init(key: jax.Array, d: int) -> Params:
    ka, kf = jax.random.split(key)
    p = {"attn_qst_query": mha_init(ka, d)}
    p.update(_ffn_block_init(kf, d, d))
    return p


def av_han_layer_init(key: jax.Array, d: int, d_ff: int) -> Params:
    keys = jax.random.split(key, 4)
    return {
        "self_attn": mha_init(keys[0], d),
        "cm_attn": mha_init(keys[1], d),
        "linear1": linear_init(keys[2], d, d_ff),
        "linear2": linear_init(keys[3], d_ff, d),
        "norm1": layer_norm_init(d),
        "norm2": layer_norm_init(d),
    }


def av_han_layer(p: Params, src_q: jax.Array, src_v: jax.Array, *,
                 nhead: int, dp: float, train: bool,
                 rng: Optional[jax.Array]) -> jax.Array:
    """One cross+self attention block (ref src/models/tspm.py:35-47)."""
    crs, _ = mha(p["cm_attn"], src_q, src_v, src_v, num_heads=nhead,
                 dropout_p=dp, train=train, rng=next_rng(rng, 0),
                 need_weights=False)
    slf, _ = mha(p["self_attn"], src_q, src_q, src_q, num_heads=nhead,
                 dropout_p=dp, train=train, rng=next_rng(rng, 1),
                 need_weights=False)
    x = src_q + dropout(next_rng(rng, 2), crs, dp, train) \
        + dropout(next_rng(rng, 3), slf, dp, train)
    x = layer_norm(p["norm1"], x)
    ffn = linear(p["linear2"],
                 dropout(next_rng(rng, 4), jax.nn.relu(linear(p["linear1"], x)),
                         dp, train))
    x = x + dropout(next_rng(rng, 5), ffn, dp, train)
    return layer_norm(p["norm2"], x)


def _attn_ffn(p: Params, query: jax.Array, key: jax.Array, value: jax.Array,
              *, nhead: int, dp: float, train: bool,
              rng: Optional[jax.Array],
              need_weights: bool = False
              ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """MHA + residual FFN + LayerNorm, the repeated TSPM sub-block
    (ref QstQueryClipAttn, src/models/tspm.py:93-110).

    query: [B, Sq, D]; returns (out [B, Sq, D], avg attn weights [B, Sq, Sk]).
    """
    attn_feat, weights = mha(p["attn_qst_query"], query, key, value,
                             num_heads=nhead, dropout_p=dp, train=train,
                             rng=next_rng(rng, 0), need_weights=need_weights)
    src = linear(p["qst_query_linear1"], attn_feat)
    src = jax.nn.relu(src)
    src = dropout(next_rng(rng, 1), src, dp, train)
    src = linear(p["qst_query_linear2"], src)
    src = dropout(next_rng(rng, 2), src, dp, train)
    out = layer_norm(p["qst_query_visual_norm"], attn_feat + src)
    return out, weights


def topk_time_indices(temp_weights: jax.Array, k: int) -> jax.Array:
    """argsort -> last-K -> time-sorted indices [B, K]
    (ref SelectTopK, src/models/tspm.py:118-122); static shapes for jit."""
    order = jnp.argsort(temp_weights[:, 0, :], axis=-1)  # ascending
    topk = order[:, -k:]
    return jnp.sort(topk, axis=-1)


def temporal_perception(p: Params, audio: jax.Array, visual: jax.Array,
                        qst_prompt: jax.Array, *, topK: int, dp: float,
                        train: bool, rng: Optional[jax.Array]):
    """Question-prompt-guided discrete top-K frame selection
    (ref TemporalPerception, src/models/tspm.py:77-143)."""
    _, weights = _attn_ffn(p, qst_prompt[:, None, :], visual, visual,
                           nhead=4, dp=dp, train=train, rng=rng,
                           need_weights=True)
    idx = topk_time_indices(weights, topK)  # [B, K]
    out_audio = jnp.take_along_axis(audio, idx[:, :, None], axis=1)
    out_visual = jnp.take_along_axis(visual, idx[:, :, None], axis=1)
    return out_audio, out_visual, idx


def tokens_self_attn(p: Params, x: jax.Array, *, nhead: int, dp: float,
                     train: bool, rng: Optional[jax.Array]) -> jax.Array:
    """Patch-token self-attention block (ref TokensSelfAttn, 189-222)."""
    slf, _ = mha(p["self_attn"], x, x, x, num_heads=nhead, dropout_p=dp,
                 train=train, rng=next_rng(rng, 0), need_weights=False)
    x = x + dropout(next_rng(rng, 1), slf, dp, train)
    x = layer_norm(p["norm1"], x)
    ffn = linear(p["linear2"],
                 dropout(next_rng(rng, 2), jax.nn.relu(linear(p["linear1"], x)),
                         dp, train))
    x = x + dropout(next_rng(rng, 3), ffn, dp, train)
    return layer_norm(p["norm2"], x)


def spatio_perception(p: Params, audio_topk: jax.Array, patch: jax.Array,
                      topk_idx: Optional[jax.Array], *, topK: int, dp: float,
                      train: bool, rng: Optional[jax.Array]) -> jax.Array:
    """Audio-guided patch attention over the selected frames
    (ref SpatioPerceptionModule, src/models/tspm.py:225-306)."""
    if topk_idx is not None:
        patch = jnp.take_along_axis(patch, topk_idx[:, :, None, None], axis=1)
    B, K, N, C = patch.shape
    patch_bt = patch.reshape(B * K, N, C)
    query_bt = audio_topk.reshape(B * K, 1, C)
    patch_bt = tokens_self_attn(p["TokensAttn"], patch_bt, nhead=1, dp=dp,
                                train=train, rng=next_rng(rng, 0))
    out, _ = _attn_ffn(p, query_bt, patch_bt, patch_bt, nhead=4, dp=dp,
                       train=train, rng=next_rng(rng, 1))
    return out.reshape(B, K, C)


def qst_temporal_grounding(p: Params, qst: jax.Array, audio: jax.Array,
                           visual: jax.Array, *, dp: float, train: bool,
                           rng: Optional[jax.Array]):
    """Question-as-query pooling of audio/visual streams (ref 146-186).

    Both calls share one parameter set, exactly like the reference using a
    single attn_qst_query module for audio and visual.
    """
    a, _ = _attn_ffn(p, qst[:, None, :], audio, audio, nhead=4, dp=dp,
                     train=train, rng=next_rng(rng, 0))
    v, _ = _attn_ffn(p, qst[:, None, :], visual, visual, nhead=4, dp=dp,
                     train=train, rng=next_rng(rng, 1))
    return a[:, 0], v[:, 0]


def tspm_init(key: jax.Array, cfg: dict) -> Params:
    h = cfg["hidden_size"]
    keys = jax.random.split(key, 12)
    return {
        "input_a": linear_init(keys[0], cfg["audio_dim"], h),
        "input_v": linear_init(keys[1], cfg["vis_dim"], h),
        "input_v_patch": linear_init(keys[2], cfg["patch_dim"], h),
        "input_qst": linear_init(keys[3], cfg["qst_dim"], h),
        "input_qst_prompt": linear_init(keys[4], cfg["qst_dim"], h),
        "AV_Attn": {
            "layers": {"0": av_han_layer_init(keys[5], h, h)},
            "norm1": layer_norm_init(h),
            "norm2": layer_norm_init(h),
        },
        "TemporalPerception": _attn_ffn_init(keys[6], h),
        "SpatioPerception": {
            **_attn_ffn_init(keys[7], h),
            "TokensAttn": av_han_layer_like_tokens_init(keys[8], h),
        },
        "QstTempGrd_Module": _attn_ffn_init(keys[9], h),
        "av_fusion_fc": linear_init(keys[10], 6 * h, h),
        "answer_pred_fc": linear_init(keys[11], h, cfg["num_labels"]),
    }


def av_han_layer_like_tokens_init(key: jax.Array, d: int) -> Params:
    keys = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(keys[0], d),
        "linear1": linear_init(keys[1], d, d),
        "linear2": linear_init(keys[2], d, d),
        "norm1": layer_norm_init(d),
        "norm2": layer_norm_init(d),
    }


def tspm_forward(params: Params, batch: Dict[str, jax.Array], cfg: dict, *,
                 train: bool = False, rng: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
    """Forward pass mirroring TSPM.forward (src/models/tspm.py:347-400)."""
    dp = cfg["dropout"]
    topK = cfg["topK"]
    audio, visual, patch = batch["audio"], batch["video"], batch["patch"]
    question, prompt = batch["quest"], batch["prompt"]
    if jnp.issubdtype(question.dtype, jnp.integer):
        raise NotImplementedError(
            "TSPM requires precomputed question/prompt features (the "
            "reference's token path references a nonexistent quest_encoder, "
            "src/models/tspm.py:375)")
    if question.ndim == 3:
        question = question[:, 0]
    if prompt.ndim == 3:
        prompt = prompt[:, 0]

    audio_feat = linear(params["input_a"], audio)
    visual_feat = linear(params["input_v"], visual)
    patch_feat = linear(params["input_v_patch"], patch)
    qst_feat = linear(params["input_qst"], question)
    qst_prompt = linear(params["input_qst_prompt"], prompt)

    # AV_Attn with num_layers=1, norm=None (ref 332, 61-74): both directions
    # share the single cloned layer and read the ORIGINAL projections — run
    # them as one batched 2B pass (identical math, better MXU occupancy).
    layer_p = params["AV_Attn"]["layers"]["0"]
    B = audio_feat.shape[0]
    both = av_han_layer(
        layer_p,
        jnp.concatenate([audio_feat, visual_feat], axis=0),
        jnp.concatenate([visual_feat, audio_feat], axis=0),
        nhead=1, dp=dp, train=train, rng=next_rng(rng, 0))
    audio_avattn, visual_avattn = both[:B], both[B:]

    audio_tssm, visual_tssm, topk_idx = temporal_perception(
        params["TemporalPerception"], audio_feat, visual_feat, qst_prompt,
        topK=topK, dp=dp, train=train, rng=next_rng(rng, 2))
    visual_sp = spatio_perception(
        params["SpatioPerception"], audio_tssm, patch_feat, topk_idx,
        topK=topK, dp=dp, train=train, rng=next_rng(rng, 3))
    audio_qtgm, visual_qtgm = qst_temporal_grounding(
        params["QstTempGrd_Module"], qst_feat, audio_tssm, visual_sp,
        dp=dp, train=train, rng=next_rng(rng, 4))

    av_feat = jnp.concatenate([
        audio_qtgm, jnp.mean(audio_avattn, axis=-2), jnp.mean(audio_tssm, axis=-2),
        visual_qtgm, jnp.mean(visual_avattn, axis=-2), jnp.mean(visual_sp, axis=-2),
    ], axis=-1)
    av_feat = jnp.tanh(av_feat)
    av_feat = linear(params["av_fusion_fc"], av_feat)
    avq_feat = av_feat * qst_feat
    avq_feat = jnp.tanh(avq_feat)
    return {"out": linear(params["answer_pred_fc"], avq_feat)}


TSPM_FROZEN_PREFIXES: Tuple[str, ...] = ()
