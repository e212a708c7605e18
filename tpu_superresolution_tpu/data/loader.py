"""Threaded prefetching host loader.

Replaces the reference's torch DataLoader (spawned workers + pin_memory
+ prefetch_factor=2 — train.py:59-76): a thread pool decodes PNGs into
pinned-ish numpy batches while TPU steps run, with a bounded prefetch
queue.  Shuffling is seeded per epoch for reproducibility.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from tpu_superresolution_tpu.data.decode import load_pair_batch
from tpu_superresolution_tpu.data.index import PairedIndex


class Loader:
    def __init__(
        self,
        index: PairedIndex,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        grayscale: bool = True,
        channels: int = 1,
        seed: int = 42,
        num_threads: int = 8,
        prefetch: int = 2,
    ):
        self.index = index
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.grayscale = grayscale
        self.channels = channels
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.index)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        batches = self._batch_indices()
        self._epoch += 1

        def load(idxs):
            pairs = [self.index[i] for i in idxs]
            return load_pair_batch(pairs, self.grayscale, self.channels)

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            futures = []
            it = iter(batches)
            # keep `prefetch` batches in flight
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is not None:
                    futures.append(pool.submit(load, b))
            while futures:
                fut = futures.pop(0)
                b = next(it, None)
                if b is not None:
                    futures.append(pool.submit(load, b))
                yield fut.result()
