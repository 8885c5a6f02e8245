"""torch ``state_dict`` <-> parameter-pytree conversion.

Because qa_tiger_tpu parameter pytrees mirror torch state_dict names exactly
(dots become nesting levels), conversion is a mechanical un-flatten:

    'at_aggregator.experts.0.0.weight' -> params['at_aggregator']['experts']['0']['0']['weight']

Handles the reference's checkpoint quirks (SURVEY.md §5 checkpoint/resume):
- ``module.`` prefixes left behind by ``nn.DataParallel`` wrapping
  (reference: src/train.py:96-103 re-adds them; src/trainutils.py:108 always
  wraps in DataParallel),
- fp16 tensors are upcast to fp32,
- keys can be filtered (e.g. the saved ckpt strips ``video_encoder*``,
  src/train.py:75-79).

torch is only needed for reading ``.pt`` files; ``.npz`` checkpoints written
by this framework load without torch.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np


def strip_module_prefix(key: str) -> str:
    while key.startswith("module."):
        key = key[len("module."):]
    return key


def flat_to_nested(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Un-flatten dotted keys into a nested dict pytree."""
    nested: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"key conflict at {key!r}: {part!r} is a leaf")
        node[parts[-1]] = value
    return nested


def nested_to_flat(nested: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict pytree back into dotted keys."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in nested.items():
        name = f"{prefix}{key}"
        if isinstance(value, Mapping):
            flat.update(nested_to_flat(value, prefix=name + "."))
        else:
            flat[name] = np.asarray(value)
    return flat


def state_dict_to_pytree(state_dict: Mapping[str, Any],
                         exclude_prefixes: Iterable[str] = (),
                         dtype: Optional[np.dtype] = np.float32) -> Dict[str, Any]:
    """Convert a torch state_dict (tensors or arrays) into a nested pytree."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        key = strip_module_prefix(key)
        if any(key.startswith(p) for p in exclude_prefixes):
            continue
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        arr = np.asarray(value)
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        flat[key] = arr
    return flat_to_nested(flat)


def load_torch_checkpoint(path: str,
                          exclude_prefixes: Iterable[str] = (),
                          dtype: Optional[np.dtype] = np.float32) -> Dict[str, Any]:
    """Load a torch ``.pt`` state_dict file into a nested pytree.

    Uses ``torch.load(map_location='cpu')`` — torch (CPU) must be installed to
    read legacy checkpoints; the framework's own ``.npz`` format does not need
    torch.
    """
    import torch  # local import: only needed for .pt interop

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state_dict, dict) and "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    return state_dict_to_pytree(state_dict, exclude_prefixes, dtype)


def save_torch_checkpoint(params: Mapping[str, Any], path: str,
                          exclude_prefixes: Iterable[str] = ()) -> None:
    """Export a parameter pytree as a torch ``.pt`` state_dict so checkpoints
    trained here load back into the PyTorch reference (the reverse direction
    of ``load_torch_checkpoint``)."""
    import torch  # local import: only needed for .pt interop

    flat = nested_to_flat(params)
    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flat.items()
        if not any(k.startswith(p) for p in exclude_prefixes)
    }
    torch.save(state_dict, path)


def merge_pytrees(base: Dict[str, Any], update: Mapping[str, Any],
                  path: str = "") -> Tuple[Dict[str, Any], list, list]:
    """Overlay ``update`` onto ``base`` (strict=False semantics).

    Returns ``(merged, missing_keys, unexpected_keys)`` like torch
    ``load_state_dict(strict=False)`` (reference logs these,
    src/trainutils.py:98-100). Shape-mismatched leaves are treated as
    unexpected and skipped.
    """
    missing: list = []
    unexpected: list = []
    merged = dict(base)
    for key, value in update.items():
        name = f"{path}{key}"
        if key not in base:
            unexpected.extend(_leaf_names(value, name))
            continue
        if isinstance(value, Mapping) and isinstance(base[key], Mapping):
            sub, sub_missing, sub_unexpected = merge_pytrees(
                dict(base[key]), value, path=name + "."
            )
            merged[key] = sub
            missing.extend(sub_missing)
            unexpected.extend(sub_unexpected)
        elif not isinstance(value, Mapping) and not isinstance(base[key], Mapping):
            if np.shape(base[key]) != np.shape(value):
                unexpected.append(name)
            else:
                merged[key] = np.asarray(value)
        else:
            unexpected.extend(_leaf_names(value, name))
    for key in base:
        if key not in update:
            missing.extend(_leaf_names(base[key], f"{path}{key}"))
    return merged, missing, unexpected


def _leaf_names(tree: Any, prefix: str) -> list:
    if isinstance(tree, Mapping):
        names = []
        for key, value in tree.items():
            names.extend(_leaf_names(value, f"{prefix}.{key}"))
        return names
    return [prefix]
