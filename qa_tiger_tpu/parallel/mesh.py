"""Device mesh construction + sharding rules.

The reference's entire distributed surface is DDP-over-NCCL data parallelism
with loss/metric all_reduce (SURVEY.md §2.6: src/utils.py:82-87,
src/trainutils.py:60-73/355-363). The TPU-native equivalent needs no explicit
collectives at all: one ``jax.sharding.Mesh``, batches sharded over the
``data`` axis, parameters replicated (or tensor-sharded over an optional
``model`` axis), and GSPMD inserts the gradient/metric reductions over ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans hosts (DCN between slices is handled by the runtime).

``param_shardings`` implements optional tensor parallelism: Linear-like
weights whose output dim divides the ``model`` axis are split column-wise on
the first projection and row-wise on the second, covering the CLIP text tower
FFN/attention (the FLOPs-dominant frozen encoder), the QA-TIGER FFNs, and the
per-expert MLPs (expert-tensor parallelism). These are layout *hints* — GSPMD
guarantees numerical equivalence regardless, so the rules are safely
best-effort.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sync_processes(name: str = "barrier") -> None:
    """Multi-host barrier (the reference's dist.barrier,
    src/trainutils.py:47-49). No-op on a single process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with the leading dim sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {
        k: jax.device_put(v, sharding)
        for k, v in batch.items()
        if k != "name"
    }


# Column-parallel first projections (output dim sharded) and row-parallel
# second projections (input dim sharded), per megatron-style TP.
_COL_KEYS = ("linear1", "c_fc", "0")        # leaf parent names
_ROW_KEYS = ("linear2", "c_proj", "2")


def _spec_for(path: Tuple[str, ...], leaf, tp: int) -> P:
    """PartitionSpec for one leaf given its nested path."""
    shape = np.shape(leaf)
    if len(path) >= 2:
        parent, name = path[-2], path[-1]
        if name == "in_proj_weight" and shape[0] % tp == 0:
            return P("model", None)
        if name == "in_proj_bias" and shape[0] % tp == 0:
            return P("model")
        if parent in _COL_KEYS and name == "weight" and len(shape) == 2 \
                and shape[0] % tp == 0:
            return P("model", None)
        if parent in _COL_KEYS and name == "bias" and len(shape) == 1 \
                and shape[0] % tp == 0:
            return P("model")
        if parent in _ROW_KEYS and name == "weight" and len(shape) == 2 \
                and shape[1] % tp == 0:
            return P(None, "model")
        if parent == "out_proj" and name == "weight" and len(shape) == 2 \
                and shape[1] % tp == 0:
            return P(None, "model")
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh):
    """Pytree of NamedShardings: replicated under pure DP, tensor-sharded
    over the 'model' axis when it is >1."""
    tp = mesh.shape.get("model", 1)

    def assign(tree, path=()):
        if isinstance(tree, dict):
            return {k: assign(v, path + (k,)) for k, v in tree.items()}
        spec = _spec_for(path, tree, tp) if tp > 1 else P()
        return NamedSharding(mesh, spec)

    return assign(params)
