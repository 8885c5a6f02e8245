"""Checkpointing: portable .npz param snapshots + full-train-state resume.

The reference saves best-val params only (``best.pt`` minus ``video_encoder*``
keys, src/train.py:72-86) with no optimizer/epoch state, so mid-training
resume is impossible there (SURVEY.md §5). This module keeps the
best-params-snapshot behaviour (as ``best.npz``, a flat dict of dotted torch
state_dict-style names — losslessly interconvertible with ``.pt``) and adds
what the reference lacks: full train-state checkpoints (params + Adam moments
+ epoch + best-acc) via orbax when available, with an .npz fallback.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import numpy as np

from qa_tiger_tpu.convert import flat_to_nested, nested_to_flat
from qa_tiger_tpu.convert.torch_import import merge_pytrees


def save_checkpoint(params: Dict[str, Any], path: str | Path,
                    exclude_prefixes: Iterable[str] = ("video_encoder",)
                    ) -> None:
    """Write params as best.npz with the reference's key filtering
    (``video_encoder*`` stripped, src/train.py:75-79).

    Checkpoints always store fp32: np.savez round-trips ml_dtypes.bfloat16
    arrays as raw void ``|V2`` blobs (unloadable), and on TPU meshes the
    runner keeps the frozen tower in bf16 (loop.py ``encoder_dtype``) —
    upcast here, re-cast on load (`AVQARunner._cast_frozen`)."""
    flat = nested_to_flat(jax.tree_util.tree_map(np.asarray, params))
    flat = {k: (v.astype(np.float32) if v.dtype.kind not in "fiub" else v)
            for k, v in flat.items()
            if not any(k.startswith(p) for p in exclude_prefixes)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path: str | Path,
                    base_params: Optional[Dict[str, Any]] = None
                    ) -> Tuple[Dict[str, Any], list, list]:
    """Load best.npz (or a torch .pt via the converter) and overlay onto
    ``base_params`` (strict=False: returns (params, missing, unexpected) like
    the reference's key-diff logging, src/trainutils.py:98-100)."""
    path = Path(path)
    if path.suffix == ".pt":
        from qa_tiger_tpu.convert import load_torch_checkpoint

        loaded = load_torch_checkpoint(str(path))
    else:
        with np.load(path) as data:
            loaded = flat_to_nested({k: data[k] for k in data.files})
    if base_params is None:
        return loaded, [], []
    base_np = jax.tree_util.tree_map(np.asarray, base_params)
    return merge_pytrees(base_np, loaded)


def save_train_state_orbax(state: Dict[str, Any], path: str | Path) -> None:
    """Orbax-backed full-state checkpoint (async-capable, multi-host-safe).

    Same contents as ``save_train_state``; use this on real deployments —
    the .npz path remains as the dependency-free fallback.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = {k: v for k, v in state.items()
            if k not in ("params", "opt_state")}
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(
            path,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(state["params"]),
                opt_state=ocp.args.StandardSave(state["opt_state"]),
                meta=ocp.args.JsonSave(meta),
            ),
            force=True,
        )


_ASYNC_CKPTR = None


def save_train_state_async(state: Dict[str, Any], path: str | Path) -> None:
    """Non-blocking orbax save: the device->host transfer happens eagerly but
    serialization to disk runs in a background thread, so the train loop
    resumes immediately (the reference blocks on torch.save each epoch). At
    most one save is in flight; call :func:`wait_for_async_saves` before
    process exit (src/train.py does)."""
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = {k: v for k, v in state.items()
            if k not in ("params", "opt_state")}
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
    _ASYNC_CKPTR.wait_until_finished()
    _ASYNC_CKPTR.save(
        path,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state["params"]),
            opt_state=ocp.args.StandardSave(state["opt_state"]),
            meta=ocp.args.JsonSave(meta),
        ),
        force=True,
    )


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_train_state_orbax(path: str | Path, template: Dict[str, Any]
                           ) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(template["params"]),
                opt_state=ocp.args.StandardRestore(template["opt_state"]),
                meta=ocp.args.JsonRestore(),
            ),
        )
    out = dict(template)
    out["params"] = restored["params"]
    out["opt_state"] = restored["opt_state"]
    out.update(restored["meta"])
    return out


def save_train_state(state: Dict[str, Any], path: str | Path) -> None:
    """Full resume checkpoint: params + optimizer state + host scalars."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    arrays = {
        "params": state["params"],
        "opt_state": state["opt_state"],
    }
    flat = {}
    for name, tree in arrays.items():
        leaves, treedef = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(np.asarray, tree))
        for i, leaf in enumerate(leaves):
            flat[f"{name}__{i}"] = leaf
        (path / f"{name}.treedef.txt").write_text(str(treedef))
    np.savez(path / "arrays.npz", **flat)
    meta = {k: v for k, v in state.items()
            if k not in ("params", "opt_state")}
    (path / "meta.json").write_text(json.dumps(meta))


def load_train_state(path: str | Path, template: Dict[str, Any]
                     ) -> Dict[str, Any]:
    """Restore a full train state using ``template`` for pytree structure.

    Auto-detects format: orbax layout (written by save_train_state_orbax /
    save_train_state_async) or the dependency-free .npz layout."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"checkpoint not found: {path}")
    if not (path / "arrays.npz").exists():
        return load_train_state_orbax(path, template)
    with np.load(path / "arrays.npz") as data:
        out = dict(template)
        for name in ("params", "opt_state"):
            leaves, treedef = jax.tree_util.tree_flatten(template[name])
            loaded = [data[f"{name}__{i}"] for i in range(len(leaves))]
            out[name] = jax.tree_util.tree_unflatten(treedef, loaded)
    meta = json.loads((path / "meta.json").read_text())
    out.update(meta)
    return out
