"""ToMe — bipartite soft token matching/merging, fixed-shape XLA.

Functional re-expression of the reference's ToMe core
(reference: src/tome/merge.py:18-241): split tokens into alternating sets
A/B, cosine-similarity scores, per-A-token best B match, merge the top-r A
tokens into their B match, keep the rest.

TPU design: ``r`` is static per layer (the extraction recipe pins
``r=[25]*23``, scripts/extract_ToMe/extract_tome14.py:162), so every layer's
merged token count is a compile-time constant — argsort/gather/segment-scatter
all have fixed shapes and XLA fuses them between attention and MLP. The
merged token ORDER matches torch exactly (``cat([unm, dst])``,
src/tome/merge.py:80) because downstream feature caches store raw 14-token
tensors.

The effective per-layer r (capped at 50% of unprotected tokens) and the token
count schedule are derivable host-side via ``tome_schedule``.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def parse_r(num_layers: int, r: Union[List[int], Tuple[int, float], int]
            ) -> List[int]:
    """Expand constant / (r, inflection) schedule / explicit list
    (semantics of reference src/tome/utils.py:80-105)."""
    inflect = 0.0
    if isinstance(r, list):
        if len(r) < num_layers:
            r = r + [0] * (num_layers - len(r))
        return list(r)
    if isinstance(r, tuple):
        r, inflect = r
    min_val = int(r * (1.0 - inflect))
    max_val = 2 * r - min_val
    step = (max_val - min_val) / (num_layers - 1)
    return [int(min_val + step * i) for i in range(num_layers)]


def effective_r(t: int, r: int, protected: int = 0) -> int:
    """The 50% cap applied by the reference (src/tome/merge.py:43-44)."""
    return max(0, min(r, (t - protected) // 2))


def tome_schedule(t0: int, rs: Sequence[int], protected: int = 1
                  ) -> List[Tuple[int, int]]:
    """[(r_eff, tokens_after)] per layer — the static shape plan.

    e.g. t0=577, rs=[25]*23 ends at 14 tokens (577 - 22*25 - 13)."""
    plan = []
    t = t0
    for r in rs:
        r_eff = effective_r(t, r, protected)
        t -= r_eff
        plan.append((r_eff, t))
    return plan


def _batched_at(x: jax.Array, idx: jax.Array):
    """Row-indexed .at accessor: x [B, T, C], idx [B, K] -> x.at[b, idx[b]]."""
    batch = jnp.arange(x.shape[0])[:, None]
    return x.at[batch, idx]


def _take(x: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def bipartite_soft_matching(metric: jax.Array, r: int,
                            class_token: bool = False,
                            distill_token: bool = False
                            ) -> Tuple[Callable, Callable]:
    """Returns (merge, unmerge) closures for [B, T, C] token tensors.

    Mirrors reference bipartite_soft_matching (src/tome/merge.py:18-97):
    A = even tokens, B = odd tokens; the class token (A[0]) and distill token
    (B[0]) are protected via -inf scores; edges sorted by similarity,
    the top-r A tokens merge into their best B match.
    """
    protected = int(class_token) + int(distill_token)
    t = metric.shape[1]
    r = effective_r(t, r, protected)
    if r <= 0:
        identity = lambda x, mode="mean": x  # noqa: E731
        return identity, identity

    metric = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = metric[..., ::2, :], metric[..., 1::2, :]
    scores = jnp.einsum("bic,bjc->bij", a, b,
                        preferred_element_type=jnp.float32)
    if class_token:
        scores = scores.at[..., 0, :].set(-jnp.inf)
    if distill_token:
        scores = scores.at[..., :, 0].set(-jnp.inf)

    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)                  # [B, Ta]
    edge_idx = jnp.argsort(-node_max, axis=-1)              # descending
    unm_idx = edge_idx[..., r:]                             # [B, Ta-r]
    src_idx = edge_idx[..., :r]                             # [B, r]
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)  # [B, r]
    if class_token:
        unm_idx = jnp.sort(unm_idx, axis=-1)  # keep class token first

    def merge(x: jax.Array, mode: str = "mean") -> jax.Array:
        src, dst = x[..., ::2, :], x[..., 1::2, :]
        unm = _take(src, unm_idx)
        sel = _take(src, src_idx)
        if mode == "sum":
            dst = _batched_at(dst, dst_idx).add(sel)
        elif mode == "amax":
            dst = _batched_at(dst, dst_idx).max(sel)
        elif mode == "mean":
            # torch scatter_reduce(reduce='mean', include_self=True)
            ones = jnp.ones(sel.shape[:-1] + (1,), dst.dtype)
            counts = _batched_at(jnp.ones(dst.shape[:-1] + (1,), dst.dtype),
                                 dst_idx).add(ones)
            dst = _batched_at(dst, dst_idx).add(sel) / counts
        else:
            raise ValueError(f"unknown merge mode {mode!r}")
        if distill_token:
            return jnp.concatenate(
                [unm[:, :1], dst[:, :1], unm[:, 1:], dst[:, 1:]], axis=1)
        return jnp.concatenate([unm, dst], axis=1)

    def unmerge(x: jax.Array) -> jax.Array:
        unm_len = unm_idx.shape[1]
        unm, dst = x[..., :unm_len, :], x[..., unm_len:, :]
        src = _take(dst, dst_idx)
        out = jnp.zeros(x.shape[:-2] + (t, x.shape[-1]), x.dtype)
        out = out.at[..., 1::2, :].set(dst)
        out = _batched_at(out, 2 * unm_idx).set(unm)
        out = _batched_at(out, 2 * src_idx).set(src)
        return out

    return merge, unmerge


def _scatter_mode(dst: jax.Array, idx: jax.Array, src: jax.Array,
                  mode: str) -> jax.Array:
    if mode == "sum":
        return _batched_at(dst, idx).add(src)
    if mode == "amax":
        return _batched_at(dst, idx).max(src)
    if mode == "mean":
        ones = jnp.ones(src.shape[:-1] + (1,), dst.dtype)
        counts = _batched_at(jnp.ones(dst.shape[:-1] + (1,), dst.dtype),
                             idx).add(ones)
        return _batched_at(dst, idx).add(src) / counts
    raise ValueError(f"unknown merge mode {mode!r}")


def kth_bipartite_soft_matching(metric: jax.Array, k: int
                                ) -> Tuple[Callable, Callable]:
    """ToMe with sets (every k-th token, the rest): n tokens -> n // k
    (ref kth_bipartite_soft_matching, src/tome/merge.py:100-153)."""
    if k <= 1:
        identity = lambda x, mode="mean": x  # noqa: E731
        return identity, identity

    t_rnd = (metric.shape[1] // k) * k
    r = (t_rnd // k) * (k - 1)

    def split(x):
        b = x.shape[0]
        x = x[:, :t_rnd].reshape(b, -1, k, x.shape[-1])
        return (x[:, :, : k - 1].reshape(b, -1, x.shape[-1]),
                x[:, :, k - 1])

    metric = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = split(metric)
    scores = jnp.einsum("bic,bjc->bij", a, b,
                        preferred_element_type=jnp.float32)
    dst_idx = jnp.argmax(scores, axis=-1)  # [B, r]

    def merge(x: jax.Array, mode: str = "mean") -> jax.Array:
        src, dst = split(x)
        return _scatter_mode(dst, dst_idx, src, mode)

    def unmerge(x: jax.Array) -> jax.Array:
        n, _, c = x.shape
        src = _take(x, dst_idx).reshape(n, -1, k - 1, c)
        dst = x.reshape(n, -1, 1, c)
        return jnp.concatenate([src, dst], axis=-2).reshape(n, -1, c)

    return merge, unmerge


def random_bipartite_soft_matching(metric: jax.Array, r: int,
                                   rng: jax.Array = None
                                   ) -> Tuple[Callable, Callable]:
    """ToMe with a random r-token source set (ref 156-207). The random
    permutation comes from an explicit jax PRNG key (functional RNG instead
    of torch's global rand)."""
    if r <= 0:
        identity = lambda x, mode="mean": x  # noqa: E731
        return identity, identity
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, N, _ = metric.shape
    rand_idx = jax.vmap(lambda k: jax.random.permutation(k, N))(
        jax.random.split(rng, B))
    a_idx, b_idx = rand_idx[:, :r], rand_idx[:, r:]

    def split(x):
        return _take(x, a_idx), _take(x, b_idx)

    metric = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = split(metric)
    scores = jnp.einsum("bic,bjc->bij", a, b,
                        preferred_element_type=jnp.float32)
    dst_idx = jnp.argmax(scores, axis=-1)

    def merge(x: jax.Array, mode: str = "mean") -> jax.Array:
        src, dst = split(x)
        return _scatter_mode(dst, dst_idx, src, mode)

    def unmerge(x: jax.Array) -> jax.Array:
        src = _take(x, dst_idx)
        out = jnp.zeros((B, N, x.shape[-1]), x.dtype)
        out = _batched_at(out, a_idx).set(src)
        out = _batched_at(out, b_idx).set(x)
        return out

    return merge, unmerge


def merge_wavg(merge: Callable, x: jax.Array, size: jax.Array = None
               ) -> Tuple[jax.Array, jax.Array]:
    """Size-weighted average merge (ref src/tome/merge.py:210-225)."""
    if size is None:
        size = jnp.ones_like(x[..., :1])
    x = merge(x * size, mode="sum")
    size = merge(size, mode="sum")
    return x / size, size


def merge_source(merge: Callable, x: jax.Array, source: jax.Array = None
                 ) -> jax.Array:
    """Token-provenance adjacency tracking (ref src/tome/merge.py:228-241)."""
    if source is None:
        n, t, _ = x.shape
        source = jnp.broadcast_to(jnp.eye(t, dtype=x.dtype), (n, t, t))
    return merge(source, mode="amax")
