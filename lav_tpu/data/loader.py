"""Batching + device-prefetch loader.

Replaces torch DataLoader (reference datasets/__init__.py:31-40:
shuffle=True, drop_last=True, pin_memory) with a numpy batcher and a
background thread that stages the next batch on device while the current
train step runs — hiding host->HBM transfer behind compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np

import jax


def collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 2021,
                 sharding=None, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idxs)
        for start in range(0, len(idxs), self.batch_size):
            chunk = idxs[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield collate([self.dataset[int(i)] for i in chunk])

    def __iter__(self):
        def put_device(b):
            if self.sharding is not None:
                return jax.tree.map(
                    lambda x: jax.device_put(x, self.sharding), b
                )
            return jax.tree.map(jax.device_put, b)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            # Exceptions must reach the consumer: a bare stop sentinel once
            # silently ended epochs when device_put raised inside this
            # thread (a bs/mesh mismatch trained ZERO steps yet "passed").
            try:
                for b in self._host_batches():
                    q.put(put_device(b))
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is stop:
                return
            if isinstance(b, BaseException):
                raise RuntimeError(
                    "DataLoader producer thread failed"
                ) from b
            yield b
