"""Grain integration: serve AVQA samples through Google Grain's loader.

Grain provides deterministic, checkpointable, multi-worker input pipelines —
the production-grade alternative to the built-in BatchLoader for large
corpora (SURVEY.md §7 hard part #7). ``AVQADataset`` already exposes
random-access ``__getitem__``/``__len__``, so it plugs into Grain as a
RandomAccessDataSource directly; ``make_grain_loader`` wires sharding,
per-epoch seeded shuffling, fixed-size padded batching (the same
``valid``-mask contract the jitted steps expect), and worker prefetch.

Optional: import errors surface only when this module is used, so the core
framework has no hard Grain dependency.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


class AVQAGrainSource:
    """grain.RandomAccessDataSource view of an AVQADataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self._dataset[int(index)]


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int
              ) -> Dict[str, np.ndarray]:
    """Pad a (possibly short tail) stacked batch to the fixed size and attach
    the ``valid`` mask the jitted steps expect."""
    n = len(next(iter(batch.values())))
    out = {}
    for key, value in batch.items():
        value = np.asarray(value)
        if n < batch_size:
            pad = np.repeat(value[:1], batch_size - n, axis=0)
            value = np.concatenate([value, pad], axis=0)
        out[key] = value
    out["valid"] = np.concatenate(
        [np.ones(n, bool), np.zeros(batch_size - n, bool)])
    return out


class GrainBatchLoader:
    """Iterable of fixed-shape masked batches backed by grain.DataLoader."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 worker_count: int = 0):
        import grain.python as grain

        self.batch_size = batch_size
        self.dataset = dataset
        self._grain = grain
        self._kwargs = dict(shuffle=shuffle, seed=seed, shard_id=shard_id,
                            num_shards=num_shards, worker_count=worker_count)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        kw = self._kwargs
        shard = range(kw["shard_id"], len(self.dataset), kw["num_shards"])
        return (len(shard) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        grain = self._grain
        kw = self._kwargs
        sampler = grain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=grain.ShardOptions(
                shard_index=kw["shard_id"], shard_count=kw["num_shards"],
                drop_remainder=False),
            shuffle=kw["shuffle"],
            num_epochs=1,
            seed=kw["seed"] + self.epoch,
        )
        loader = grain.DataLoader(
            data_source=AVQAGrainSource(self.dataset),
            sampler=sampler,
            operations=[grain.Batch(batch_size=self.batch_size,
                                    drop_remainder=False)],
            worker_count=kw["worker_count"],
        )
        for batch in loader:
            batch = {k: v for k, v in batch.items() if k != "name"}
            yield pad_batch(batch, self.batch_size)


def make_grain_loader(dataset, batch_size: int, **kwargs) -> GrainBatchLoader:
    """Drop-in alternative to data.BatchLoader backed by Grain."""
    return GrainBatchLoader(dataset, batch_size, **kwargs)
