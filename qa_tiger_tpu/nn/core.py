"""Functional NN primitives with torch-compatible parameter pytrees.

Every layer is a pair of pure functions: ``*_init(key, ...) -> params`` and an
apply function ``layer(params, x, ...) -> y``. Parameter dicts mirror torch
``state_dict`` naming exactly (``{'weight': [out, in], 'bias': [out]}``;
``nn.Sequential`` children keyed '0', '2', ...), so a torch checkpoint
un-flattens straight into our pytree (see qa_tiger_tpu/convert/torch_import.py)
and golden-tensor parity tests can copy weights both ways.

Initializers match torch semantics:
- ``linear_init``: torch ``nn.Linear`` default = kaiming_uniform(a=sqrt(5)) on
  the weight, uniform(+-1/sqrt(fan_in)) on the bias.
- ``kaiming_linear_init``: the reference's explicit
  ``nn.init.kaiming_normal_`` + zero bias (reference: src/models/net.py:71-75,
  src/models/modules.py:295-302).

Compute notes (TPU): weights keep torch's ``[out, in]`` layout; ``x @ W.T`` is
a free layout choice for XLA's MXU tiling. All matmuls request fp32
accumulation via ``preferred_element_type`` so bf16 activations keep fp32
accuracy on the MXU.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def next_rng(rng: Optional[jax.Array], site: int) -> Optional[jax.Array]:
    """Derive a per-call-site dropout key; None passes through (eval mode)."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, site)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                dtype=jnp.float32) -> Params:
    """torch ``nn.Linear`` default init (kaiming_uniform a=sqrt(5))."""
    wkey, bkey = jax.random.split(key)
    # gain for leaky_relu(a=sqrt(5)) = sqrt(2 / (1 + 5)) = sqrt(1/3)
    # bound = gain * sqrt(3 / fan_in) = 1 / sqrt(fan_in)
    bound = 1.0 / math.sqrt(in_features)
    weight = jax.random.uniform(
        wkey, (out_features, in_features), dtype, minval=-bound, maxval=bound
    )
    bias = jax.random.uniform(
        bkey, (out_features,), dtype, minval=-bound, maxval=bound
    )
    return {"weight": weight, "bias": bias}


def kaiming_linear_init(key: jax.Array, in_features: int, out_features: int,
                        dtype=jnp.float32) -> Params:
    """``nn.init.kaiming_normal_`` (fan_in, gain sqrt(2)) weight + zero bias."""
    std = math.sqrt(2.0 / in_features)
    weight = std * jax.random.normal(key, (out_features, in_features), dtype)
    return {"weight": weight, "bias": jnp.zeros((out_features,), dtype)}


def matmul_pref(dtype) -> Any:
    """Output dtype for MXU matmuls: fp32 activations keep fp32 outputs; for
    bf16 activations the MXU still accumulates in fp32 internally but rounds
    the OUTPUT to bf16 — halving the HBM bytes of every projection (the
    model is HBM-bandwidth-bound, see SURVEY §6 / ops/pallas docs)."""
    return jnp.float32 if dtype == jnp.float32 else dtype


def linear(params: Params, x: jax.Array) -> jax.Array:
    """y = x @ W.T + b (fp32 accumulation on the MXU)."""
    pref = matmul_pref(x.dtype)
    y = jnp.matmul(x, params["weight"].T, preferred_element_type=pref)
    y = y + params["bias"].astype(pref)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch ``nn.LayerNorm`` over the last dim (biased variance, eps inside sqrt)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["weight"] + params["bias"]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    """Inverted dropout, identical semantics to ``nn.Dropout``.

    In eval mode (``train=False`` or ``rng is None``) this is the identity, so
    jitted eval graphs contain no RNG ops at all.
    """
    if not train or rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# 2-layer MLP (nn.Sequential(Linear, ReLU, Linear) -> keys '0','2')
# ---------------------------------------------------------------------------

def mlp2_init(key: jax.Array, in_features: int, hidden: int,
              out_features: int, init: str = "kaiming",
              dtype=jnp.float32) -> Params:
    k0, k2 = jax.random.split(key)
    init_fn = kaiming_linear_init if init == "kaiming" else linear_init
    return {
        "0": init_fn(k0, in_features, hidden, dtype),
        "2": init_fn(k2, hidden, out_features, dtype),
    }


def mlp2(params: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(linear(params["0"], x))
    return linear(params["2"], h)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (reference: src/models/base/clip_base.py:166-168)."""
    return x * jax.nn.sigmoid(1.702 * x)
