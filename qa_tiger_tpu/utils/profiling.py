"""Tracing / profiling utilities.

The reference has no profiler integration — only wall-clock batch timing and
ETA logging in the train loop (src/trainutils.py:268, 294-297). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-viewable device traces (set ``QA_TIGER_PROFILE_DIR`` or pass a
  config key to enable around training steps),
- ``annotate(name)``: named trace region for host-side phases,
- ``AverageMeter``: running per-key means, API-compatible with the
  reference's meter (src/trainutils.py:29-44).
"""
from __future__ import annotations

import contextlib
from collections import defaultdict
from typing import Iterable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class AverageMeter:
    """Running means over named values (reference src/trainutils.py:29-44)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.values = defaultdict(float)
        self.count = 0

    def update(self, vals: Iterable[Tuple[str, float]], step_n: int) -> None:
        for key, val in vals:
            self.values[key] += float(val)
        self.count += step_n

    def get(self, key: str) -> float:
        return self.values[key] / max(self.count, 1)
