"""Data loading: samplers + a threaded prefetching loader.

Replaces paddle.io.DataLoader / DistributedBatchSampler (reference:
examples/fastspeech2/train.py:101-110, parakeet/training/
standard_updater.py:162-168) with a host-side loader designed for SPMD:

- ``ShardedBatchSampler`` deterministically shards *batches* across hosts
  (``num_shards`` = ``jax.process_count()`` in multihost runs) with an
  epoch-seeded shuffle, the TPU analog of DistributedBatchSampler.set_epoch.
- ``DataLoader`` maps a collate fn over sampled batches on a background
  thread so host preprocessing overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Sequence

import numpy as np

__all__ = ["BatchSampler", "ShardedBatchSampler", "DataLoader"]


class BatchSampler:
    """Yields lists of indices; optional shuffle, drop_last."""

    def __init__(self, dataset_size: int, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0):
        self.dataset_size = dataset_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(self.dataset_size)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[List[int]]:
        idx = self._indices()
        end = (self.dataset_size // self.batch_size * self.batch_size
               if self.drop_last else self.dataset_size)
        for s in range(0, end, self.batch_size):
            yield idx[s:s + self.batch_size].tolist()

    def __len__(self) -> int:
        if self.drop_last:
            return self.dataset_size // self.batch_size
        return (self.dataset_size + self.batch_size - 1) // self.batch_size


class ShardedBatchSampler(BatchSampler):
    """BatchSampler that keeps every ``num_shards``-th batch for this host.

    All hosts iterate the same epoch-seeded permutation, so shards are
    disjoint and exhaustive without communication.
    """

    def __init__(self, dataset_size: int, batch_size: int,
                 num_shards: int = 1, shard_id: int = 0, **kwargs):
        super().__init__(dataset_size, batch_size, **kwargs)
        if not 0 <= shard_id < num_shards:
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.num_shards = num_shards
        self.shard_id = shard_id

    def __iter__(self) -> Iterator[List[int]]:
        for i, batch in enumerate(super().__iter__()):
            if i % self.num_shards == self.shard_id:
                yield batch

    def __len__(self) -> int:
        total = super().__len__()
        return (total - self.shard_id + self.num_shards - 1) // self.num_shards


class DataLoader:
    """Iterates ``collate_fn([dataset[i] for i in batch])`` with prefetch.

    ``prefetch`` > 0 runs collation on a daemon thread feeding a bounded
    queue; 0 collates synchronously (useful in tests).
    """

    def __init__(self, dataset, batch_sampler: BatchSampler,
                 collate_fn: Callable, prefetch: int = 2):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.prefetch = prefetch

    def _produce(self, out_q: "queue.Queue", batches: Sequence[List[int]]):
        try:
            for batch_idx in batches:
                examples = [self.dataset[i] for i in batch_idx]
                out_q.put(("item", self.collate_fn(examples)))
        except BaseException as e:  # propagate to consumer
            out_q.put(("error", e))
        else:
            out_q.put(("done", None))

    def __iter__(self):
        batches = list(self.batch_sampler)
        if self.prefetch <= 0:
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_idx])
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        worker = threading.Thread(
            target=self._produce, args=(out_q, batches), daemon=True)
        worker.start()
        while True:
            kind, payload = out_q.get()
            if kind == "item":
                yield payload
            elif kind == "error":
                raise payload
            else:
                return

    def __len__(self) -> int:
        return len(self.batch_sampler)
