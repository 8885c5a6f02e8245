"""Deterministic seeding.

JAX is functionally random (explicit PRNG keys), so unlike the reference
(src/utils.py:46-60, global torch/numpy/random seeding + cudnn determinism
flags) the model/optimizer randomness is already reproducible by construction.
This module seeds the *host-side* RNGs used for data shuffling and provides
the root jax key, with a per-process offset for multi-host runs (mirroring the
reference's per-rank seed offsets, src/utils.py:55-60).
"""
from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int, rank: int | None = None) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    ``rank`` defaults to ``jax.process_index()`` so each host shuffles its
    shard differently while staying reproducible.
    """
    if rank is None:
        try:
            rank = jax.process_index()
        except RuntimeError:  # backend not initialised yet
            rank = 0
    np.random.seed(seed + rank)
    random.seed(seed + rank)
    return jax.random.PRNGKey(seed)
