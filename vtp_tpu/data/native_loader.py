"""Batch loader backed by the native C++ ingest library.

Decodes/preprocesses whole batches in the C++ thread pool (no Python in
the pixel loop) and prefetches ahead of the accelerator. Drop-in
replacement for DataLoader+transform in the throughput paths
(latent extraction, serving); eval-parity paths keep PIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from vtp_tpu.data.imagefolder import ImageFolder
from vtp_tpu.native import MODE_ADM_CROP, ingest_batch, native_available


class NativeImageLoader:
    def __init__(
        self,
        dataset: ImageFolder,
        batch_size: int,
        *,
        target: int = 256,
        mode: int = MODE_ADM_CROP,
        aux: int = 0,
        mean: Sequence[float] = (0.485, 0.456, 0.406),
        std: Sequence[float] = (0.229, 0.224, 0.225),
        flip_all: bool = False,
        sampler: Optional[Sequence[int]] = None,
        num_threads: int = 0,
        prefetch: int = 3,
        drop_last: bool = False,
    ):
        if not native_available():
            raise RuntimeError("native ingest library unavailable")
        self.dataset = dataset
        self.batch_size = batch_size
        self.target = target
        self.mode = mode
        self.aux = aux
        self.mean = mean
        self.std = std
        self.flip_all = flip_all
        self.sampler = sampler
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last

    def _index_batches(self) -> Iterator[List[int]]:
        idx = self.sampler if self.sampler is not None else range(len(self.dataset))
        batch: List[int] = []
        for i in idx:
            batch.append(int(i))
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            try:
                for bidx in self._index_batches():
                    paths = [self.dataset.samples[i][0] for i in bidx]
                    labels = np.asarray([self.dataset.samples[i][1] for i in bidx])
                    flips = [1] * len(paths) if self.flip_all else None
                    x = ingest_batch(
                        paths, self.target, mode=self.mode, aux=self.aux,
                        mean=self.mean, std=self.std, flips=flips,
                        num_threads=self.num_threads,
                    )
                    q.put((x, labels))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
