"""Throughput benchmark harness.

Equivalent of the reference's ``tome.utils.benchmark`` (reference:
src/tome/utils.py:15-77): measure steady-state throughput of a model
function, discarding a warmup fraction of iterations. Differences for TPU:

- results are fetched to host (``np.asarray``) before stopping the clock —
  on asynchronous/remote backends ``block_until_ready`` alone can return
  before execution finishes and inflate numbers,
- an optional bf16 mode casts inputs (the analogue of the reference's fp16
  autocast flag),
- the function is jitted once outside the timed region.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def benchmark(fn: Callable, *args,
              runs: int = 40,
              throw_out: float = 0.25,
              use_bf16: bool = False,
              items_per_call: int = 1,
              verbose: bool = False,
              **kwargs) -> float:
    """Returns items/sec of ``fn(*args, **kwargs)`` at steady state.

    ``throw_out``: fraction of initial runs discarded as warmup (reference
    default 0.25). ``items_per_call``: e.g. the batch size, so the result is
    images/sec or qa-pairs/sec.
    """
    if use_bf16:
        args = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, args)

    jitted = jax.jit(fn)
    _materialize(jitted(*args, **kwargs))

    warmup = max(1, int(runs * throw_out))
    for _ in range(warmup):
        out = jitted(*args, **kwargs)
    _materialize(out)

    timed = runs - warmup
    start = time.perf_counter()
    for _ in range(timed):
        out = jitted(*args, **kwargs)
    _materialize(out)
    elapsed = time.perf_counter() - start
    ips = items_per_call * timed / elapsed
    if verbose:
        print(f"Throughput: {ips:.2f} items/sec "
              f"({elapsed / timed * 1e3:.3f} ms/call)")
    return ips


def _materialize(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)
