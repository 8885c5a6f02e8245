"""QA-TIGER building blocks, functional JAX edition.

Each block mirrors the reference module of the same name
(reference: src/models/modules.py) in parameter structure and numerics, but
the computation is re-expressed TPU-first: batch-first layouts, no python
loops in the traced graph (expert MLPs and Gaussian masks are batched einsums,
see qa_tiger_tpu/ops/tempmoe.py), and dropout keys derived functionally.

Blocks:
- Projection        (ref src/models/modules.py:19-43)
- AVCrossAttn       (ref 46-156; defined-but-unused by QA_TIGER — kept for parity)
- AVQCrossAttn      (ref 159-265)
- QstGrounding      (ref 268-347)
- TempMoE           (ref 350-612)
- PatchSelecter     (ref 615-716)
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from qa_tiger_tpu.nn import (
    dropout,
    kaiming_linear_init,
    layer_norm,
    layer_norm_init,
    linear,
    mha,
    mha_init,
    mlp2,
    mlp2_init,
    next_rng,
)
from qa_tiger_tpu.ops.pallas.gaussian_moe import fused_gaussian_moe
from qa_tiger_tpu.ops.tempmoe import (
    combined_expert_weights,
    experts_forward,
    gaussian_expert_aggregate,
    gaussian_weights,
    topk_renormalized,
)

Params = dict


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

def projection_init(key: jax.Array, inp_dim: int, d_model: int) -> Params:
    """nn.Linear wrapped as 'proj'; kaiming-normal init applied by the parent
    net (ref src/models/net.py:63-68)."""
    return {"proj": kaiming_linear_init(key, inp_dim, d_model)}


def projection(params: Params, x: jax.Array) -> jax.Array:
    return linear(params["proj"], x)


# ---------------------------------------------------------------------------
# AVCrossAttn (bidirectional self+cross block; unused by QA_TIGER but part of
# the reference component inventory)
# ---------------------------------------------------------------------------

def av_cross_attn_init(key: jax.Array, d_model: int) -> Params:
    keys = jax.random.split(key, 4)
    return {
        "crs_attn": mha_init(keys[0], d_model),
        "slf_attn": mha_init(keys[1], d_model),
        "linear1": kaiming_linear_init(keys[2], d_model, d_model),
        "linear2": kaiming_linear_init(keys[3], d_model, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def _av_sub_forward(params: Params, src_q: jax.Array, src_v: jax.Array,
                    *, nhead: int, dropout_p: float, train: bool,
                    rng: Optional[jax.Array]) -> jax.Array:
    slf, _ = mha(params["slf_attn"], src_q, src_q, src_q, num_heads=nhead,
                 dropout_p=dropout_p, train=train, rng=next_rng(rng, 0),
                 need_weights=False)
    crs, _ = mha(params["crs_attn"], src_q, src_v, src_v, num_heads=nhead,
                 dropout_p=dropout_p, train=train, rng=next_rng(rng, 1),
                 need_weights=False)
    x = src_q + dropout(next_rng(rng, 2), slf, dropout_p, train) \
        + dropout(next_rng(rng, 3), crs, dropout_p, train)
    x = layer_norm(params["norm1"], x)
    ffn = linear(params["linear2"],
                 dropout(next_rng(rng, 4), jax.nn.relu(linear(params["linear1"], x)),
                         dropout_p, train))
    x = x + dropout(next_rng(rng, 5), ffn, dropout_p, train)
    return layer_norm(params["norm2"], x)


def av_cross_attn(params: Params, src_q: jax.Array, src_v: jax.Array,
                  *, nhead: int = 8, dropout_p: float = 0.1,
                  train: bool = False, rng: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    src1 = _av_sub_forward(params, src_q, src_v, nhead=nhead,
                           dropout_p=dropout_p, train=train,
                           rng=next_rng(rng, 10))
    src2 = _av_sub_forward(params, src_v, src_q, nhead=nhead,
                           dropout_p=dropout_p, train=train,
                           rng=next_rng(rng, 11))
    return src1, src2


# ---------------------------------------------------------------------------
# AVQCrossAttn
# ---------------------------------------------------------------------------

def avq_cross_attn_init(key: jax.Array, d_model: int) -> Params:
    keys = jax.random.split(key, 5)
    return {
        "qst_attn": mha_init(keys[0], d_model),
        "crs_attn": mha_init(keys[1], d_model),
        "slf_attn": mha_init(keys[2], d_model),
        "linear1": kaiming_linear_init(keys[3], d_model, d_model),
        "linear2": kaiming_linear_init(keys[4], d_model, d_model),
        "norm1": layer_norm_init(d_model),
        "norm2": layer_norm_init(d_model),
    }


def _avq_sub_forward(params: Params, src_q: jax.Array, src_v: jax.Array,
                     query: jax.Array, *, nhead: int, dropout_p: float,
                     train: bool, rng: Optional[jax.Array],
                     need_weights: bool = True
                     ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One direction: residual = src + drop(slf) + drop(crs) + drop(qst)
    (ref src/models/modules.py:215-228). Returns (out, question-attn weights)."""
    qst_out, weight = mha(params["qst_attn"], src_q, query, query,
                          num_heads=nhead, dropout_p=dropout_p, train=train,
                          rng=next_rng(rng, 0), need_weights=need_weights)
    slf, _ = mha(params["slf_attn"], src_q, src_q, src_q, num_heads=nhead,
                 dropout_p=dropout_p, train=train, rng=next_rng(rng, 1),
                 need_weights=False)
    crs, _ = mha(params["crs_attn"], src_q, src_v, src_v, num_heads=nhead,
                 dropout_p=dropout_p, train=train, rng=next_rng(rng, 2),
                 need_weights=False)
    x = src_q \
        + dropout(next_rng(rng, 3), slf, dropout_p, train) \
        + dropout(next_rng(rng, 4), crs, dropout_p, train) \
        + dropout(next_rng(rng, 5), qst_out, dropout_p, train)
    x = layer_norm(params["norm1"], x)
    ffn = linear(params["linear2"],
                 dropout(next_rng(rng, 6), jax.nn.relu(linear(params["linear1"], x)),
                         dropout_p, train))
    x = x + dropout(next_rng(rng, 7), ffn, dropout_p, train)
    return layer_norm(params["norm2"], x), weight


def avq_cross_attn(params: Params, src_q: jax.Array, src_v: jax.Array,
                   query: jax.Array, *, nhead: int = 8, dropout_p: float = 0.1,
                   train: bool = False, rng: Optional[jax.Array] = None,
                   visualize: bool = False, use_fused: bool = True):
    """Bidirectional question-guided cross attention (ref 239-265).

    Both directions share the same parameter set (the reference calls
    self.sub_forward twice), so we run them as ONE batched pass over a
    2B-sized batch — identical math, twice the MXU tile occupancy.

    Train mode on TPU routes through the fused AVQ forward+backward
    kernel pair (ops/pallas/avq.py) with the dropout realization sampled
    once here as explicit masks — the PatchSelecter train-kernel pattern;
    under AD the XLA path materializes every [2B, H, T, T] probability
    tensor and its gradient in HBM.
    """
    B = src_q.shape[0]
    q_cat = jnp.concatenate([src_q, src_v], axis=0)
    v_cat = jnp.concatenate([src_v, src_q], axis=0)
    query_cat = jnp.concatenate([query, query], axis=0)
    if (use_fused and not visualize and train and dropout_p > 0.0
            and rng is not None
            and os.environ.get("QA_TIGER_AVQ_FUSED", "1") != "0"):
        from qa_tiger_tpu.ops.pallas import avq as AVQ

        N, T = q_cat.shape[0], q_cat.shape[1]
        masks = make_avq_dropout_masks(
            next_rng(rng, 12), N, T, query_cat.shape[1], q_cat.shape[2],
            nhead=nhead, dropout_p=dropout_p, dtype=q_cat.dtype)
        out = AVQ.fused_avq_train(q_cat, v_cat, query_cat, params, masks,
                                  nhead, AVQ.AVQ_TILE)
        return out[:B], out[B:]
    out, w = _avq_sub_forward(params, q_cat, v_cat, query_cat, nhead=nhead,
                              dropout_p=dropout_p, train=train,
                              rng=next_rng(rng, 10), need_weights=visualize)
    src1, src2 = out[:B], out[B:]
    if visualize:
        return src1, src2, [w[:B], w[B:]]
    return src1, src2


def make_avq_dropout_masks(rng: jax.Array, N: int, T: int, S: int, D: int,
                           *, nhead: int, dropout_p: float,
                           dtype=jnp.float32) -> dict:
    """Sample the AVQ sub-forward's eight dropout realizations ONCE per
    step, in the fused kernel's 2D geometry, pre-scaled by 1/(1-p).

    - ``qst``/``slf``/``crs`` [N*T, pad128(H*Sk)]: attention-probability
      masks (row n*T+t, lane h*Sk+key; Sk is S for qst, T for slf/crs),
    - ``d_slf``/``d_crs``/``d_qst`` [N*T, D]: the three residual-stream
      dropouts (ref src/models/modules.py:215-228),
    - ``ffn1`` [N*T, D]: post-ReLU dropout inside the FFN,
    - ``ffn2`` [N*T, D]: the FFN-output residual dropout.

    Shared by the fused forward, the hand-written backward, AND the jnp
    oracle (avq_sub_forward_masked) so all three see identical randomness.
    """
    keys = jax.random.split(rng, 8)
    keep = 1.0 - dropout_p
    scale = 1.0 / keep

    def bern(k, shape, pad_to=None):
        m = jax.random.bernoulli(k, keep, shape).astype(dtype) * scale
        if pad_to and pad_to != shape[1]:
            m = jnp.pad(m, ((0, 0), (0, pad_to - shape[1])))
        return m

    pad128 = lambda n: -(-n // 128) * 128  # noqa: E731
    return {
        "qst": bern(keys[0], (N * T, nhead * S), pad128(nhead * S)),
        "slf": bern(keys[1], (N * T, nhead * T), pad128(nhead * T)),
        "crs": bern(keys[2], (N * T, nhead * T), pad128(nhead * T)),
        "d_slf": bern(keys[3], (N * T, D)),
        "d_crs": bern(keys[4], (N * T, D)),
        "d_qst": bern(keys[5], (N * T, D)),
        "ffn1": bern(keys[6], (N * T, D)),
        "ffn2": bern(keys[7], (N * T, D)),
    }


def avq_sub_forward_masked(params: Params, src_q: jax.Array,
                           src_v: jax.Array, query: jax.Array, masks: dict,
                           *, nhead: int = 8) -> jax.Array:
    """The XLA-composed AVQ sub-forward with explicit multiplicative
    dropout masks (make_avq_dropout_masks) — the oracle the fused train
    kernels are tested against (same contract as patch_selecter_jnp's
    ``masks`` path)."""
    N, T, D = src_q.shape
    S = query.shape[1]

    def pm(m, Sk):
        return m[:, :nhead * Sk].reshape(N, T, nhead, Sk) \
            .transpose(0, 2, 1, 3)                     # [N, H, T, Sk]

    def rd(m):
        return m.reshape(N, T, D).astype(src_q.dtype)

    qst_out, _ = mha(params["qst_attn"], src_q, query, query,
                     num_heads=nhead, need_weights=False,
                     prob_mask=pm(masks["qst"], S))
    slf, _ = mha(params["slf_attn"], src_q, src_q, src_q, num_heads=nhead,
                 need_weights=False, prob_mask=pm(masks["slf"], T))
    crs, _ = mha(params["crs_attn"], src_q, src_v, src_v, num_heads=nhead,
                 need_weights=False, prob_mask=pm(masks["crs"], T))
    x = src_q + rd(masks["d_slf"]) * slf + rd(masks["d_crs"]) * crs \
        + rd(masks["d_qst"]) * qst_out
    x = layer_norm(params["norm1"], x)
    h = jax.nn.relu(linear(params["linear1"], x)) * rd(masks["ffn1"])
    ffn = linear(params["linear2"], h)
    x = x + rd(masks["ffn2"]) * ffn
    return layer_norm(params["norm2"], x)


# ---------------------------------------------------------------------------
# QstGrounding
# ---------------------------------------------------------------------------

def qst_grounding_init(key: jax.Array, d_model: int) -> Params:
    keys = jax.random.split(key, 2)
    return {
        "attn": mha_init(keys[0], d_model),
        "mlp": mlp2_init(keys[1], d_model, d_model // 2, d_model, init="kaiming"),
        "norm": layer_norm_init(d_model),
    }


def qst_grounding(params: Params, qst: jax.Array,
                  data: Union[jax.Array, List[jax.Array]], *,
                  nhead: int = 8, dropout_p: float = 0.1, train: bool = False,
                  rng: Optional[jax.Array] = None) -> jax.Array:
    """Question-as-query attention fusion (ref src/models/modules.py:304-347).

    out = mean_seq(data) + dropout(MLP(attn(qst, data, data))), LayerNorm.
    ``data`` may be a list of [B, S_i, D] streams concatenated along seq.
    """
    if isinstance(data, (list, tuple)):
        data = jnp.concatenate(list(data), axis=1)
    q = qst[:, None, :]  # [B, 1, D]
    attn_out, _ = mha(params["attn"], q, data, data, num_heads=nhead,
                      dropout_p=0.1, train=train, rng=next_rng(rng, 0),
                      need_weights=False)
    attn_out = attn_out[:, 0]
    feat = jnp.mean(data, axis=1) + dropout(
        next_rng(rng, 1), mlp2(params["mlp"], attn_out), dropout_p, train
    )
    return layer_norm(params["norm"], feat)


# ---------------------------------------------------------------------------
# TempMoE
# ---------------------------------------------------------------------------

def temp_moe_init(key: jax.Array, d_model: int, n_experts: int,
                  vis_branch: bool = False) -> Params:
    keys = jax.random.split(key, 3 + n_experts)
    params: Params = {
        "qst_attn": mha_init(keys[0], d_model),
        "gauss_pred": {"0": kaiming_linear_init(keys[1], d_model, 2 * n_experts)},
        "router": {"0": kaiming_linear_init(keys[2], d_model, n_experts)},
        "experts": {
            str(i): mlp2_init(keys[3 + i], d_model, d_model // 2, d_model,
                              init="kaiming")
            for i in range(n_experts)
        },
    }
    if vis_branch:
        params["anorm"] = layer_norm_init(d_model)
        params["vnorm"] = layer_norm_init(d_model)
    else:
        params["norm"] = layer_norm_init(d_model)
    return params


def _stack_experts(params: Params, n_experts: int):
    w1 = jnp.stack([params["experts"][str(i)]["0"]["weight"] for i in range(n_experts)])
    b1 = jnp.stack([params["experts"][str(i)]["0"]["bias"] for i in range(n_experts)])
    w2 = jnp.stack([params["experts"][str(i)]["2"]["weight"] for i in range(n_experts)])
    b2 = jnp.stack([params["experts"][str(i)]["2"]["bias"] for i in range(n_experts)])
    return w1, b1, w2, b2


def temp_moe(params: Params, qst: jax.Array, data: jax.Array,
             sub_data: Optional[List[jax.Array]] = None, *,
             nhead: int = 8, topK: int = 5, n_experts: int = 10,
             sigma: float = 9.0, train: bool = False,
             rng: Optional[jax.Array] = None,
             gather_mode: str = "reference",
             use_fused: bool = True):
    """Question-aware temporal Gaussian mixture of experts (ref 350-612).

    Returns [B, 1, D] (or a pair for the visual branch), matching the
    reference's output shape contract. The margin/base-center schedule is
    re-derived from ``n_experts`` — it is NOT a checkpointed parameter
    (ref 404-408).
    """
    B, T, C = data.shape
    margin = 1.0 / (n_experts * 2)
    base_centers = jnp.linspace(margin, 1.0 - margin, n_experts,
                                dtype=jnp.float32)

    # question attends the temporal stream -> routing feature [B, D]
    temp_w, _ = mha(params["qst_attn"], qst[:, None, :], data, data,
                    num_heads=nhead, dropout_p=0.1, train=train,
                    rng=next_rng(rng, 0), need_weights=False)
    temp_w = temp_w[:, 0]

    router_probs = jax.nn.softmax(
        linear(params["router"]["0"], temp_w).astype(jnp.float32), axis=-1
    )
    topk_probs, topk_inds = topk_renormalized(router_probs, topK)

    gauss_cw = linear(params["gauss_pred"]["0"], temp_w)
    gauss_cw = gauss_cw.reshape(B, n_experts, 2).astype(jnp.float32)
    centers = base_centers[None, :] + jnp.tanh(gauss_cw[:, :, 0]) * margin
    widths = jax.nn.sigmoid(gauss_cw[:, :, 1])
    sel_centers = jnp.take_along_axis(centers, topk_inds, axis=1)
    sel_widths = jnp.take_along_axis(widths, topk_inds, axis=1)
    gauss_w = gaussian_weights(sel_centers, sel_widths, T, sigma)  # [B, K, T]

    w1, b1, w2, b2 = _stack_experts(params, n_experts)

    if use_fused:
        # fold gates+Gaussians+gather into one weight tensor and run the
        # fused Pallas kernel (ops/pallas/gaussian_moe.py)
        w_bet = combined_expert_weights(
            gauss_w, topk_inds, topk_probs, n_experts, gather_mode)
        w1t = jnp.transpose(w1, (0, 2, 1))  # [E, D, H]
        w2t = jnp.transpose(w2, (0, 2, 1))  # [E, H, D]

        def aggregate(stream: jax.Array) -> jax.Array:
            # streams stacked along batch share the per-sample weights; tile
            # w to match so 2 streams run as ONE kernel launch
            reps = stream.shape[0] // B
            w = w_bet if reps == 1 else jnp.tile(w_bet, (reps, 1, 1))
            out = fused_gaussian_moe(stream, w1t, b1, w2t, b2,
                                     w.astype(stream.dtype))
            return out[:, None, :]  # [B*reps, 1, D]
    else:
        def aggregate(stream: jax.Array) -> jax.Array:
            reps = stream.shape[0] // B
            tile = lambda a: (a if reps == 1  # noqa: E731
                              else jnp.tile(a, (reps,) + (1,) * (a.ndim - 1)))
            expert_out = experts_forward(w1, b1, w2, b2, stream)
            out = gaussian_expert_aggregate(
                expert_out, tile(gauss_w), tile(topk_inds),
                tile(topk_probs).astype(stream.dtype),
                gather_mode=gather_mode)
            return out[:, None, :]

    if sub_data is not None:
        # both streams in one batched aggregation (identical math)
        both = aggregate(jnp.concatenate(
            [data + sub_data[0], data + sub_data[1]], axis=0))
        a_outs, v_outs = both[:B], both[B:]
        return (layer_norm(params["anorm"], a_outs),
                layer_norm(params["vnorm"], v_outs))
    outs = aggregate(data)
    return layer_norm(params["norm"], outs)


# ---------------------------------------------------------------------------
# PatchSelecter
# ---------------------------------------------------------------------------

def patch_selecter_init(key: jax.Array, d_model: int) -> Params:
    keys = jax.random.split(key, 3)
    return {
        "slf_attn": mha_init(keys[0], d_model),
        "crs_attn": mha_init(keys[1], d_model),
        "mlp": mlp2_init(keys[2], d_model, d_model // 2, d_model, init="kaiming"),
        "anorm": layer_norm_init(d_model),
        "vnorm": layer_norm_init(d_model),
    }


def patch_selecter(params: Params, patch: jax.Array, audio: jax.Array,
                   video: jax.Array, *, nhead: int = 8, dropout_p: float = 0.1,
                   train: bool = False, rng: Optional[jax.Array] = None,
                   use_fused: bool = True) -> List[jax.Array]:
    """Per-frame audio/video-guided patch summarization (ref 656-716).

    Eval path on TPU runs the whole module as ONE fused Pallas kernel
    (ops/pallas/patch_select.py) — separate XLA ops round-trip every
    intermediate through HBM and the tiny [*, 14, 64] attention layouts
    waste most of each VMEM tile. Train mode on TPU runs the fused TRAIN
    kernels: the dropout realization is sampled once here as explicit
    masks (make_patch_dropout_masks) consumed by both the fused forward
    and the hand-written fused backward (_kernel_bwd). Non-TPU backends
    use the (masked) jnp path below. Returns [a_patch, v_patch], each
    [B, T, D].
    """
    if use_fused:
        from qa_tiger_tpu.ops.pallas import patch_select as PS

        if not (train and dropout_p > 0.0 and rng is not None):
            a_final, v_final = PS.fused_patch_select(patch, audio, video,
                                                     params, nhead)
            return [a_final, v_final]
        # train mode: sample the dropout realization ONCE (outside the
        # kernels, with the functional PRNG — sharding-independent), then
        # run the fused forward + fused hand-written backward
        B, T, P, D = patch.shape
        masks = make_patch_dropout_masks(
            next_rng(rng, 7), B * T, P, D, nhead=nhead, dropout_p=dropout_p,
            dtype=patch.dtype)
        a_final, v_final = PS.fused_patch_select_train(
            patch, audio, video, params, masks, nhead, PS.TRAIN_TILE)
        return [a_final, v_final]
    return patch_selecter_jnp(params, patch, audio, video, nhead=nhead,
                              dropout_p=dropout_p, train=train, rng=rng)


def make_patch_dropout_masks(rng: jax.Array, BT: int, P: int, D: int,
                             *, nhead: int, dropout_p: float,
                             dtype=jnp.float32) -> dict:
    """Sample the PatchSelecter's three dropout realizations ONCE per step,
    in the fused kernel's 2D geometry, pre-scaled by 1/(1-p).

    The train-mode fused kernel and its hand-written backward kernel (and
    the masked jnp path the tests compare against) must all see the SAME
    dropout masks, so they are sampled outside with jax.random and passed
    in, instead of being drawn inside each path:

    - ``slf`` [BT*P, pad128(H*P)]: entry (bt*P+qi, h*P+ki) masks the
      self-attention probability (bt, head h, query patch qi, key patch ki),
    - ``crs_v`` / ``crs_a`` [BT, pad128(H*P)]: the cross-attention
      probability masks of the video-query and audio-query streams (the
      kernels keep the two 1-token-per-frame query streams separate —
      interleaving them costs Mosaic layout relayouts and nothing else),
    - ``out_v`` / ``out_a`` [BT, D]: the pre-MLP dropout per stream.

    Lane padding keeps Mosaic's 128-lane block constraint; padded lanes are
    never read.
    """
    L = nhead * P
    Lp = -(-L // 128) * 128
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    keep = 1.0 - dropout_p
    scale = 1.0 / keep

    def bern(k, shape):
        return jax.random.bernoulli(k, keep, shape).astype(dtype) * scale

    m_slf = bern(k1, (BT * P, L))
    m_crs_v = bern(k2, (BT, L))
    m_crs_a = bern(k3, (BT, L))
    if Lp != L:
        m_slf = jnp.pad(m_slf, ((0, 0), (0, Lp - L)))
        m_crs_v = jnp.pad(m_crs_v, ((0, 0), (0, Lp - L)))
        m_crs_a = jnp.pad(m_crs_a, ((0, 0), (0, Lp - L)))
    return {"slf": m_slf, "crs_v": m_crs_v, "crs_a": m_crs_a,
            "out_v": bern(k4, (BT, D)), "out_a": bern(k5, (BT, D))}


def patch_selecter_jnp(params: Params, patch: jax.Array, audio: jax.Array,
                       video: jax.Array, *, nhead: int = 8,
                       dropout_p: float = 0.1, train: bool = False,
                       rng: Optional[jax.Array] = None,
                       masks: Optional[dict] = None) -> List[jax.Array]:
    """The XLA-composed PatchSelecter: all T frames as one B*T batch of
    attention problems — identical to the reference's reshape.

    ``masks`` (from make_patch_dropout_masks) replaces the internal dropout
    sampling with explicit multiplicative masks — the oracle the fused
    train kernels are tested against."""
    B, T, P, D = patch.shape
    BT = B * T
    patch_bt = patch.reshape(BT, P, D)
    audio_bt = audio.reshape(BT, 1, D)
    video_bt = video.reshape(BT, 1, D)

    L = nhead * P
    pm_slf = pm_crs = None
    if masks is not None:
        pm_slf = masks["slf"][:, :L].reshape(BT, P, nhead, P) \
            .transpose(0, 2, 1, 3)                     # [BT, H, P, P]
        pm_crs = jnp.stack(
            [masks["crs_v"][:, :L].reshape(BT, nhead, P),
             masks["crs_a"][:, :L].reshape(BT, nhead, P)],
            axis=2)                                    # [BT, H, 2, P]

    slf, _ = mha(params["slf_attn"], patch_bt, patch_bt, patch_bt,
                 num_heads=nhead, dropout_p=dropout_p, train=train,
                 rng=next_rng(rng, 0), need_weights=False, prob_mask=pm_slf)
    patch_bt = patch_bt + slf

    query = jnp.concatenate([video_bt, audio_bt], axis=1)  # [B*T, 2, D] video first
    crs, _ = mha(params["crs_attn"], query, patch_bt, patch_bt,
                 num_heads=nhead, dropout_p=dropout_p, train=train,
                 rng=next_rng(rng, 1), need_weights=False, prob_mask=pm_crs)
    if masks is not None:
        crs = crs * jnp.stack([masks["out_v"], masks["out_a"]],
                              axis=1).astype(crs.dtype)
    else:
        crs = dropout(next_rng(rng, 2), crs, dropout_p, train)
    out = mlp2(params["mlp"], crs)
    v_rel, a_rel = out[:, 0], out[:, 1]
    a_final = a_rel.reshape(B, T, D)
    v_final = v_rel.reshape(B, T, D)
    return [layer_norm(params["anorm"], a_final),
            layer_norm(params["vnorm"], v_final)]
