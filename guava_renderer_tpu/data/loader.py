"""Batching + background prefetch loader.

Replaces torch DataLoader + DistributedSampler (ref: main/train.py:44-58,
main/trainer.py:52-58): per-host shard selection, shuffled epoch order,
numpy collation, and a background thread that keeps `prefetch` batches
ready so host decode overlaps device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(records: list[dict]) -> dict:
    """Stack a list of nested dicts of numpy arrays along a new batch axis."""
    def stack(items):
        first = items[0]
        if isinstance(first, dict):
            return {k: stack([it[k] for it in items]) for k in first}
        return np.stack([np.asarray(it) for it in items])

    return stack(records)


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last
        self._epoch = 0

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        # per-host shard (DistributedSampler role)
        return idx[self.host_id :: self.num_hosts]

    def __iter__(self):
        idx = self._epoch_indices()
        self._epoch += 1
        n_batches = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            n_batches += 1

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in range(n_batches):
                    sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    q.put(collate([self.dataset[int(i)] for i in sel]))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def __len__(self):
        return len(self._epoch_indices()) // self.batch_size


def endless(loader: PrefetchLoader):
    """Infinite iterator (the reference's retry-on-StopIteration loop,
    ref: main/trainer.py:73-78)."""
    while True:
        yield from loader
