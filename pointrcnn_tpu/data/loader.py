"""Host-side data loading with background prefetch.

Replaces the reference's torch DataLoader worker-process pool
(train_rcnn.py:71-85) with a thread-pool prefetcher: samples are built by the
(numpy, GIL-releasing) dataset pipeline on background threads while the TPU
executes the previous step, and batches are optionally pushed to device ahead
of time (double buffering into HBM).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor

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

    def _make_sample(self, idx: int):
        # Per-sample RNG derived from (seed, epoch, idx) only, so sample
        # construction is order-independent and safe to run on any worker.
        rng = np.random.RandomState(
            (self.seed + 100003 * self.epoch + 31 * int(idx)) % (2**31 - 1)
        )
        return self.dataset.getitem(int(idx), rng)

    def __iter__(self):
        batch_iter = self._batches()
        # Per-sample jobs fan out over num_workers threads (the pipeline is
        # numpy-heavy and releases the GIL); up to `prefetch` whole batches
        # are in flight ahead of the consumer, so sample building for batch
        # k+1..k+prefetch overlaps the device step on batch k.
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pending: deque = deque()

        def fill():
            while len(pending) < self.prefetch + 1:
                indices = next(batch_iter, None)
                if indices is None:
                    return
                pending.append(
                    [pool.submit(self._make_sample, int(i)) for i in indices]
                )

        try:
            fill()
            while pending:
                futures = pending.popleft()
                samples = [f.result() for f in futures]
                fill()
                yield self.dataset.collate_batch(samples)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
