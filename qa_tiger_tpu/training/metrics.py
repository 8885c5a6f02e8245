"""Masked loss + 9-way question-type accuracy counters.

The reference accumulates python-side counters per question type and
all_reduces them (src/trainutils.py:329-363, 406-440). Here the counters are
computed on-device as segment sums indexed by ``qtype_label`` — under pjit
with a batch sharded over the mesh's 'data' axis, the sums are global
automatically (GSPMD inserts the psum), which *is* the all_reduce.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from qa_tiger_tpu.data.annotations import NUM_QTYPES, idx2qtype


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         valid: jax.Array) -> jax.Array:
    """Mean CE over valid samples (== nn.CrossEntropyLoss on the unpadded
    batch; padding rows contribute zero)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def qtype_counters(logits: jax.Array, labels: jax.Array,
                   qtype_label: jax.Array, valid: jax.Array
                   ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (correct, total, correct_per_type[9], total_per_type[9])."""
    pred = jnp.argmax(logits, axis=-1)
    ok = (pred == labels) & valid
    w = valid.astype(jnp.int32)
    okw = ok.astype(jnp.int32)
    tot9 = jax.ops.segment_sum(w, qtype_label, num_segments=NUM_QTYPES)
    cor9 = jax.ops.segment_sum(okw, qtype_label, num_segments=NUM_QTYPES)
    return jnp.sum(okw), jnp.sum(w), cor9, tot9


def accuracy_report(correct: int, total: int, cor9, tot9,
                    log_fn, prefix: str = "Test", epoch: int | None = None,
                    writer=None, writer_tag: str = "valid/acc"
                    ) -> Dict[str, float]:
    """Per-type / per-modality / total accuracy logging with the reference's
    format (src/trainutils.py:370-392, 443-461). Returns the accuracy dict."""
    head = f"Epoch {epoch} -" if epoch is not None else prefix
    out: Dict[str, float] = {}
    cor9 = [int(x) for x in cor9]
    tot9 = [int(x) for x in tot9]
    by_mod: Dict[str, Tuple[int, int]] = {}
    for idx, (mod, qt) in enumerate(idx2qtype):
        c, t = cor9[idx], tot9[idx]
        mc, mt = by_mod.get(mod, (0, 0))
        by_mod[mod] = (mc + c, mt + t)
        value = c / t * 100.0 if t else 0.0
        key = f"{mod}/{qt}"
        out[key] = value
        log_fn(f"{head} {key:>24} accuracy: {value:.2f}({c}/{t})")
        if writer is not None and epoch is not None:
            writer.add_scalar(f"{writer_tag}/{key}", value, epoch)
    for mod, (mc, mt) in by_mod.items():
        value = mc / mt * 100.0 if mt else 0.0
        out[mod] = value
        log_fn(f"{head} {mod:>24} accuracy: {value:.2f}({mc}/{mt})")
        if writer is not None and epoch is not None:
            writer.add_scalar(f"{writer_tag}/{mod}", value, epoch)
    acc = correct / total * 100.0 if total else 0.0
    out["Total"] = acc
    key = "Total" if epoch is not None else "Total avg"
    log_fn(f"{head} {key:>24} accuracy: {acc:.2f}({correct}/{total})")
    return out
