"""Model factory: dispatch on the config's ``model_type`` prefix.

Mirrors the reference factory (src/trainutils.py:86-91): names starting with
'QA-TIGER' build the flagship net, 'TSPM' the baseline. Returns a uniform
(model_cfg, init_fn, forward_fn, frozen_prefixes) tuple the training loop and
CLI consume.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

ModelBundle = Tuple[dict, Callable, Callable, Tuple[str, ...]]


def _build_qa_tiger(model_kwargs: dict, num_labels: int) -> ModelBundle:
    from qa_tiger_tpu.models.qa_tiger import (
        FROZEN_PREFIXES,
        qa_tiger_config,
        qa_tiger_forward,
        qa_tiger_init,
    )

    cfg = qa_tiger_config(num_labels=num_labels, **model_kwargs)
    return cfg, qa_tiger_init, qa_tiger_forward, FROZEN_PREFIXES


def _build_tspm(model_kwargs: dict, num_labels: int) -> ModelBundle:
    from qa_tiger_tpu.models.tspm import (
        TSPM_FROZEN_PREFIXES,
        tspm_config,
        tspm_forward,
        tspm_init,
    )

    cfg = tspm_config(num_labels=num_labels, **model_kwargs)
    return cfg, tspm_init, tspm_forward, TSPM_FROZEN_PREFIXES


MODEL_REGISTRY: Dict[str, Callable[[dict, int], ModelBundle]] = {
    "QA-TIGER": _build_qa_tiger,
    "TSPM": _build_tspm,
}


def build_model(model_type: str, model_kwargs: dict,
                num_labels: int = 42) -> ModelBundle:
    for prefix, builder in MODEL_REGISTRY.items():
        if model_type.startswith(prefix):
            return builder(dict(model_kwargs), num_labels)
    raise NotImplementedError(
        f"Model type {model_type} is not implemented; known prefixes: "
        f"{sorted(MODEL_REGISTRY)}")
