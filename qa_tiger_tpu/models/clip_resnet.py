"""CLIP ModifiedResNet vision tower in JAX (the RN-family image encoder).

Mirrors the reference's vendored OpenAI CLIP ModifiedResNet
(reference: src/models/base/clip_base.py:10-154): a 3-conv anti-aliased
stem with an average pool, four Bottleneck stages where every strided
convolution is replaced by an avgpool + stride-1 conv, and a final QKV
AttentionPool2d instead of global average pooling.

TPU-first choices: NHWC activations so convolutions tile directly onto the
MXU, eval-mode BatchNorm folded into a single scale/shift (XLA fuses it into
the preceding conv), and the attention pool expressed as batched einsums.

Parameter names mirror the CLIP ``visual.*`` state_dict (conv1..3/bn1..3
stem, layerN.M.{conv,bn}{1,2,3} + layerN.M.downsample.{0,1},
attnpool.{positional_embedding,q_proj,k_proj,v_proj,c_proj}) so the same
mechanical checkpoint conversion used for the ViT towers applies.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = dict

BN_EPS = 1e-5

# OpenAI released RN vision configs; embed_dim = width*32, heads =
# width*32//64 (reference clip_base.py:473-499 build_model sniffing)
CLIP_RESNET_CONFIGS: Dict[str, dict] = {
    "RN50": dict(layers=(3, 4, 6, 3), width=64, output_dim=1024,
                 input_resolution=224),
    "RN101": dict(layers=(3, 4, 23, 3), width=64, output_dim=512,
                  input_resolution=224),
    "RN50x4": dict(layers=(4, 6, 10, 6), width=80, output_dim=640,
                   input_resolution=288),
}

EXPANSION = 4  # Bottleneck.expansion (clip_base.py:11)


def resnet_config(name: str) -> dict:
    if name not in CLIP_RESNET_CONFIGS:
        raise KeyError(f"unknown CLIP ResNet type {name!r}; "
                       f"known: {sorted(CLIP_RESNET_CONFIGS)}")
    cfg = dict(CLIP_RESNET_CONFIGS[name])
    cfg["embed_dim"] = cfg["width"] * 32
    cfg["heads"] = cfg["embed_dim"] // 64
    return cfg


# ---------------------------------------------------------------- inits
def _conv_init(key, out_ch: int, in_ch: int, k: int) -> Params:
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) -> U(-b, b) with
    # b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)
    fan_in = in_ch * k * k
    bound = fan_in ** -0.5
    return {"weight": jax.random.uniform(
        key, (out_ch, in_ch, k, k), minval=-bound, maxval=bound)}


def _bn_init(ch: int) -> Params:
    return {"weight": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "running_mean": jnp.zeros((ch,)), "running_var": jnp.ones((ch,))}


def _linear_init(key, out_d: int, in_d: int) -> Params:
    bound = in_d ** -0.5
    k1, k2 = jax.random.split(key)
    return {"weight": jax.random.uniform(k1, (out_d, in_d),
                                         minval=-bound, maxval=bound),
            "bias": jax.random.uniform(k2, (out_d,),
                                       minval=-bound, maxval=bound)}


def _bottleneck_init(key, inplanes: int, planes: int, stride: int) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "conv1": _conv_init(ks[0], planes, inplanes, 1),
        "bn1": _bn_init(planes),
        "conv2": _conv_init(ks[1], planes, planes, 3),
        "bn2": _bn_init(planes),
        "conv3": _conv_init(ks[2], planes * EXPANSION, planes, 1),
        "bn3": _bn_init(planes * EXPANSION),
    }
    if stride > 1 or inplanes != planes * EXPANSION:
        # downsample = avgpool -> 1x1 conv (index "0") -> bn (index "1"),
        # matching the reference's OrderedDict naming (clip_base.py:36-40)
        p["downsample"] = {"0": _conv_init(ks[3], planes * EXPANSION,
                                           inplanes, 1),
                           "1": _bn_init(planes * EXPANSION)}
    return p


def clip_resnet_init(key: jax.Array, name: str = "RN50") -> Params:
    cfg = resnet_config(name)
    w, heads, out_d = cfg["width"], cfg["heads"], cfg["output_dim"]
    embed = cfg["embed_dim"]
    keys = jax.random.split(key, 10)
    params: Params = {
        "conv1": _conv_init(keys[0], w // 2, 3, 3),
        "bn1": _bn_init(w // 2),
        "conv2": _conv_init(keys[1], w // 2, w // 2, 3),
        "bn2": _bn_init(w // 2),
        "conv3": _conv_init(keys[2], w, w // 2, 3),
        "bn3": _bn_init(w),
    }
    inplanes = w
    for i, (planes, blocks) in enumerate(zip((w, 2 * w, 4 * w, 8 * w),
                                             cfg["layers"]), start=1):
        stride = 1 if i == 1 else 2
        bkeys = jax.random.split(keys[2 + i], blocks)
        layer: Params = {"0": _bottleneck_init(bkeys[0], inplanes, planes,
                                               stride)}
        inplanes = planes * EXPANSION
        for b in range(1, blocks):
            layer[str(b)] = _bottleneck_init(bkeys[b], inplanes, planes, 1)
        params[f"layer{i}"] = layer

    spacial = cfg["input_resolution"] // 32
    pk = jax.random.split(keys[8], 4)
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(
            keys[9], (spacial ** 2 + 1, embed)) / embed ** 0.5,
        "q_proj": _linear_init(pk[0], embed, embed),
        "k_proj": _linear_init(pk[1], embed, embed),
        "v_proj": _linear_init(pk[2], embed, embed),
        "c_proj": _linear_init(pk[3], out_d, embed),
    }
    return params


# -------------------------------------------------------------- forward
def _conv(p: Params, x: jax.Array, *, stride: int = 1,
          padding: int = 0) -> jax.Array:
    kernel = jnp.transpose(p["weight"], (2, 3, 1, 0)).astype(x.dtype)  # HWIO
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p: Params, x: jax.Array) -> jax.Array:
    # eval-mode BatchNorm folded to scale/shift (running stats are frozen
    # at inference in the reference's CLIP usage)
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + BN_EPS)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    out = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, k, k, 1), (1, k, k, 1), "VALID")
    return out / (k * k)


def _bottleneck(p: Params, x: jax.Array, *, stride: int) -> jax.Array:
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out, padding=1)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    if "downsample" in p:
        identity = x if stride == 1 else _avg_pool(x, stride)
        identity = _bn(p["downsample"]["1"],
                       _conv(p["downsample"]["0"], identity))
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(p: Params, x: jax.Array, *, heads: int) -> jax.Array:
    """[B, H, W, C] -> [B, output_dim]; clip_base.py:58-95 AttentionPool2d."""
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)

    def proj(lin, v):
        return v @ lin["weight"].astype(v.dtype).T + lin["bias"].astype(v.dtype)

    hd = C // heads
    q = proj(p["q_proj"], x[:, :1]).reshape(B, 1, heads, hd)
    k = proj(p["k_proj"], x).reshape(B, -1, heads, hd)
    v = proj(p["v_proj"], x).reshape(B, -1, heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    pooled = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
    return proj(p["c_proj"], pooled)[:, 0]


def clip_resnet_encode(params: Params, images: jax.Array, *,
                       name: str = "RN50") -> Tuple[jax.Array, jax.Array]:
    """[B, H, W, 3] (CLIP-normalized, NHWC) -> (pooled [B, output_dim],
    pre-pool feature tokens [B, (H/32)*(W/32), embed_dim]).

    The reference forward returns only the attention-pooled embedding
    (clip_base.py:141-154); the token map is exposed for API symmetry with
    ``clip_vision_encode``.
    """
    cfg = resnet_config(name)
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], images,
                                             stride=2, padding=1)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], x, padding=1)))
    x = jax.nn.relu(_bn(params["bn3"], _conv(params["conv3"], x, padding=1)))
    x = _avg_pool(x, 2)
    for i in range(1, 5):
        layer = params[f"layer{i}"]
        stride = 1 if i == 1 else 2
        for b in range(len(layer)):
            x = _bottleneck(layer[str(b)], x, stride=stride if b == 0 else 1)
    B, H, W, C = x.shape
    pooled = _attention_pool(params["attnpool"], x, heads=cfg["heads"])
    return pooled, x.reshape(B, H * W, C)
