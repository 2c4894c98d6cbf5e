"""Host-side data loader: threaded prefetching batches of numpy arrays.

Replaces torch ``DataLoader(num_workers=8, pin_memory, drop_last)``
(reference ``train.py:35-56``). Audio decode + video transform are
IO/numpy bound, so a thread pool saturates them without process fork
overhead; batches are stacked into pinned-free numpy arrays ready for
``jax.device_put`` (sharded placement handled by ``parallel.shard_batch``).

For data parallelism across hosts, pass ``shard_index/num_shards`` to
partition the sample space per host (single-controller multi-host JAX).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np


def default_collate(samples: Sequence):
    """Stack tuple elements; non-array fields (utt ids) become lists."""
    first = samples[0]
    out = []
    for i in range(len(first)):
        vals = [s[i] for s in samples]
        if isinstance(first[i], np.ndarray):
            out.append(np.stack(vals))
        else:
            out.append(vals)
    return tuple(out)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = True,
        collate_fn: Callable = default_collate,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.seed = seed
        self.epoch = 0
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index::self.num_shards]

    def __iter__(self) -> Iterator:
        idx = self._indices()
        n_batches = len(self)
        batches = [
            idx[b * self.batch_size:(b + 1) * self.batch_size]
            for b in range(n_batches)
        ]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(self.collate_fn(samples))
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
