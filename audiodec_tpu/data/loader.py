"""Threaded prefetching data loader (replaces torch DataLoader workers,
ref: codecTrain.py:68-86 num_workers).

Host-side pipeline: worker threads read+decode WAVs and build collated
batches; the consumer (train loop) overlaps host I/O with TPU compute by
double-buffered prefetch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, collate_fn: Callable, batch_size: int,
                 shuffle: bool = True, num_workers: int = 2,
                 prefetch: int = 4, seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        """One pass over the dataset with threaded prefetch."""
        idx = self._epoch_indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        work: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        out: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        for i, b in enumerate(batches):
            work.put((i, b))
        n_batches = len(batches)
        results = {}
        lock = threading.Lock()

        def worker():
            while True:
                try:
                    i, b = work.get_nowait()
                except queue.Empty:
                    return
                items = [self.dataset[int(j)] for j in b]
                batch = self.collate_fn(items)
                out.put((i, batch))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        # deliver in order
        next_i = 0
        received = 0
        while received < n_batches:
            i, batch = out.get()
            received += 1
            with lock:
                results[i] = batch
            while next_i in results:
                yield results.pop(next_i)
                next_i += 1

    def infinite(self) -> Iterator:
        """Endless epoch-cycling iterator (step-driven training)."""
        while True:
            yield from self
