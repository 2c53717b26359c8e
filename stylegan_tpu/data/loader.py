"""Threaded, prefetching batch loader.

Replaces the reference's torch DataLoader worker processes
(data/__init__.py:32-52): a thread pool decodes/resizes images while the TPU
runs the previous step, and a small prefetch queue keeps host->device
transfers off the critical path.  Per-resolution batch size is a constructor
arg — the trainer builds a new loader per depth exactly like the reference
(GAN.py:739).

Multi-host hooks: pass (shard_index, num_shards) to give each host a disjoint
stripe of every epoch's permutation (deterministic from the epoch seed).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


class _ProducerError:
    """Exception carrier from the producer thread to the consuming iterator."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self._epoch = 0
        self.conditional = getattr(dataset, "labels", None) is not None

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        rs = np.random.RandomState((self.seed, self._epoch))
        idx = rs.permutation(n) if self.shuffle else np.arange(n)
        return idx[self.shard_index::self.num_shards]

    def __iter__(self) -> Iterator:
        indices = self._epoch_indices()
        nb = len(self)
        if nb == 0:
            return
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        epoch_rng_base = np.random.RandomState(
            (self.seed, self._epoch, 7919)).randint(0, 2 ** 31)

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(bi, batch_idx):
            imgs, labels = [], []
            for j, di in enumerate(batch_idx):
                # RandomState seeds must be < 2**32; wrap (large datasets at
                # small batch sizes push bi*100003 past 2**32 otherwise)
                rng = np.random.RandomState(
                    (epoch_rng_base + bi * 100003 + j) % (2 ** 32))
                item = self.dataset.get(int(di), rng)
                if self.conditional:
                    img, lab = item
                    labels.append(lab)
                else:
                    img = item
                imgs.append(img)
            x = np.stack(imgs).astype(np.float32)
            if self.conditional:
                return x, np.asarray(labels, dtype=np.int32)
            return x

        def put_or_stop(item) -> bool:
            """Bounded put that keeps observing the stop flag (a blocking
            q.put would deadlock the producer forever if the consumer
            abandons the iterator mid-epoch)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                futures = []
                for bi, b in enumerate(batches):
                    if stop.is_set():
                        return
                    futures.append(pool.submit(load_batch, bi, b))
                    # keep a bounded window of in-flight decode jobs
                    while len(futures) > self.num_workers + self.prefetch:
                        if not put_or_stop(futures.pop(0).result()):
                            return
                for f in futures:
                    if not put_or_stop(f.result()):
                        return
                put_or_stop(None)
            except Exception as e:  # surface decode errors to the consumer
                put_or_stop(_ProducerError(e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)
            # advance even when the iterator is abandoned mid-epoch, so the
            # next epoch gets a fresh permutation and augmentation stream
            self._epoch += 1


def get_data_loader(dataset, batch_size: int, num_workers: int, **kw) -> DataLoader:
    """Factory mirroring reference data/__init__.py:32-52."""
    return DataLoader(dataset, batch_size, num_workers=num_workers,
                      shuffle=True, drop_last=True, **kw)


def device_prefetch(iterator, size: int = 2):
    """Wrap a batch iterator so host->device transfers run `size` batches
    ahead of consumption (device_put is async; the TPU computes on batch N
    while batch N+1 streams into HBM)."""
    import collections
    import jax

    def put(batch):
        if isinstance(batch, tuple):
            return tuple(jax.device_put(b) for b in batch)
        return jax.device_put(batch)

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
