"""Pallas TPU kernel: fused Gaussian-weighted expert MLP aggregation.

The TempMoE hot op computes, per batch row b:

    out[b, :] = sum_e sum_t w[b, e, t] * MLP_e(x[b, t, :])

where MLP_e = Linear(D->H) -> ReLU -> Linear(H->D) and ``w`` is the combined
gate-probability x peak-normalized-Gaussian weight (any expert-gather mode is
already folded into w — see qa_tiger_tpu/models/modules.py).

The straightforward XLA formulation materializes the all-expert activation
tensor [B, T, E, D] in HBM (e.g. 110 MB at B=128 eval shapes) and then
reduces it — HBM-bandwidth-bound. This kernel streams over experts instead:
for each (batch-tile, expert) grid step it keeps the hidden activations in
VMEM, reduces over T immediately (the T-reduction commutes with the second
Linear), and accumulates the [TB, D] output tile in place. HBM traffic drops
to x (once per expert) + weights + the [B, D] output.

    h  = relu(x_tile @ W1_e + b1_e)          # MXU  [TB*T, H]
    s  = sum_t w[b,e,t] * h[b,t,:]           # VPU  [TB, H]
    out += s @ W2_e + (sum_t w[b,e,t]) b2_e  # MXU  [TB, D]

Gradients: the op carries a custom VJP whose backward re-derives cotangents
through the pure-jnp reference formulation (rematerialized forward), so the
kernel is safe to use under jax.grad.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on pure-CPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except ImportError:  # pragma: no cover
    _HAVE_PLTPU = False

DEFAULT_BATCH_TILE = 8


def _reference_impl(x, w1t, b1, w2t, b2, w):
    """Pure-jnp formulation (used for CPU fallback and the backward pass).

    Contracts T before the second Linear, so even the fallback never builds
    the [B, T, E, D] tensor.
    """
    h = jax.nn.relu(jnp.einsum(
        "btd,edh->bteh", x, w1t, preferred_element_type=jnp.float32) + b1)
    s = jnp.einsum("bet,bteh->beh", w, h, preferred_element_type=jnp.float32)
    out = jnp.einsum("beh,ehd->bd", s, w2t, preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bet,ed->bd", w, b2,
                           preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _kernel(x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref, w_ref, out_ref):
    e = pl.program_id(1)
    tb, t, d = x_ref.shape
    x2 = x_ref[:].reshape(tb * t, d)
    h = jnp.dot(x2, w1t_ref[0], preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + b1_ref[0, 0])
    h3 = h.reshape(tb, t, -1)
    wv = w_ref[0].astype(jnp.float32)                  # [TB, T]
    s = jnp.sum(h3 * wv[:, :, None], axis=1)           # [TB, H]
    contrib = jnp.dot(s, w2t_ref[0], preferred_element_type=jnp.float32)
    contrib = contrib + jnp.sum(wv, axis=1)[:, None] * b2_ref[0, 0]

    @pl.when(e == 0)
    def _():
        out_ref[:] = contrib.astype(out_ref.dtype)

    @pl.when(e > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)


def _pallas_impl(x, w1t, b1, w2t, b2, w, batch_tile: int, interpret: bool):
    B, T, D = x.shape
    E, _, H = w1t.shape
    tb = min(batch_tile, B)
    pad = (-B) % tb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0), (0, 0)))
    nb = x.shape[0] // tb
    # layouts that satisfy the (8, 128)-divisible-or-full tiling rule on the
    # trailing two dims: biases get a unit row axis, w goes expert-major
    b1 = b1.reshape(E, 1, H)
    b2 = b2.reshape(E, 1, D)
    w_ebt = jnp.transpose(w, (1, 0, 2))  # [E, B, T]

    grid_spec = pl.GridSpec(
        grid=(nb, E),
        in_specs=[
            pl.BlockSpec((tb, T, D), lambda i, e: (i, 0, 0)),
            pl.BlockSpec((1, D, H), lambda i, e: (e, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda i, e: (e, 0, 0)),
            pl.BlockSpec((1, H, D), lambda i, e: (e, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, e: (e, 0, 0)),
            pl.BlockSpec((1, tb, T), lambda i, e: (e, i, 0)),
        ],
        out_specs=pl.BlockSpec((tb, D), lambda i, e: (i, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], D), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * T * E * D * H * 2,
            bytes_accessed=x.size * 4 * E + (w1t.size + w2t.size) * 4,
            transcendentals=0,
        ),
    )(x, w1t, b1, w2t, b2, w_ebt)
    return out[:B] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_gaussian_moe(x: jax.Array,      # [B, T, D]
                       w1t: jax.Array,    # [E, D, H] (pre-transposed)
                       b1: jax.Array,     # [E, H]
                       w2t: jax.Array,    # [E, H, D] (pre-transposed)
                       b2: jax.Array,     # [E, D]
                       w: jax.Array,      # [B, E, T] combined weights
                       batch_tile: int = DEFAULT_BATCH_TILE,
                       interpret: bool | None = None) -> jax.Array:
    """Fused sum_{e,t} w[b,e,t] * MLP_e(x[b,t]) -> [B, D]."""
    return _forward(x, w1t, b1, w2t, b2, w, batch_tile, interpret)


# process-wide override for "are we compiling for TPU devices?", set by
# AVQARunner from its mesh (tracers can't be asked for their devices). None =
# auto-detect below.
_FORCE_TPU_KERNELS: bool | None = None


def set_tpu_kernels_enabled(enabled: bool | None) -> None:
    global _FORCE_TPU_KERNELS
    _FORCE_TPU_KERNELS = enabled


def _on_tpu(x) -> bool:
    """True when this computation will run on a TPU device.

    Order: eager arrays' committed devices (ground truth); for tracers the
    runner override, then an explicitly-pinned jax_default_device, then the
    default backend.
    """
    if not isinstance(x, jax.core.Tracer):
        try:
            return any(d.platform == "tpu" for d in x.devices())
        except Exception:
            pass
    if _FORCE_TPU_KERNELS is not None:
        return _FORCE_TPU_KERNELS
    default = jax.config.jax_default_device
    if default is not None:
        return getattr(default, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _forward(x, w1t, b1, w2t, b2, w, batch_tile, interpret):
    if not _HAVE_PLTPU:
        return _reference_impl(x, w1t, b1, w2t, b2, w)
    if interpret is None:
        if _on_tpu(x):
            interpret = False
        else:
            # real Mosaic lowering needs a TPU; skip the kernel entirely on
            # CPU (the jnp formulation is already T-contracted and fast)
            return _reference_impl(x, w1t, b1, w2t, b2, w)
    return _pallas_impl(x, w1t, b1, w2t, b2, w, batch_tile, interpret)


def _fwd(x, w1t, b1, w2t, b2, w, batch_tile, interpret):
    out = _forward(x, w1t, b1, w2t, b2, w, batch_tile, interpret)
    return out, (x, w1t, b1, w2t, b2, w)


def _bwd(batch_tile, interpret, residuals, g):
    x, w1t, b1, w2t, b2, w = residuals
    _, vjp = jax.vjp(_reference_impl, x, w1t, b1, w2t, b2, w)
    return vjp(g)


fused_gaussian_moe.defvjp(_fwd, _bwd)
