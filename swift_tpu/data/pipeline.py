"""Host-side input pipeline: batch assembly + background prefetch.

Replaces the reference's torch DataLoader worker pool (reference
train.py:181-209) with a thread-pool prefetcher producing ready-to-shard
numpy batches. The TPU must never wait on h5 reads (SURVEY.md §7.3 "Input
pipeline"), so batches are assembled ahead of time in worker threads and
handed over via a bounded queue.

Batch dict layout (NHWC):
  ``x``     (B, H, W, C+F) standardized condition
  ``t``     (B, H, W, C)   standardized (residual) target
  ``idx``   (B,)           source indices
  ``delta`` (B, 1)         Δ/10 auxiliary conditioning
plus, when ``multistep_forcings`` is set, ``forcings_seq`` of shape
(B, steps, H, W, F) — the pre-staged forcing sequence the CRPS multistep
loss consumes (the reference reads these from disk inside the loss,
loss.py:380-395).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def _collate(samples):
    xs, ts, idxs, deltas = [], [], [], []
    for (x, t), (idx, delta) in samples:
        xs.append(x)
        ts.append(t)
        idxs.append(idx)
        deltas.append(delta)
    return {
        "x": np.stack(xs, 0),
        "t": np.stack(ts, 0),
        "idx": np.asarray(idxs, np.int32),
        "delta": np.asarray(deltas, np.float32).reshape(-1, 1),
    }


class BatchLoader:
    """Iterate batches from (dataset, sampler) with background prefetch.

    ``sampler`` yields ints or (idx, offset[, delta]) tuples; batches of
    ``batch_size`` consecutive yields are assembled concurrently by a thread
    pool (h5py releases the GIL on IO).
    """

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        num_workers: int = 4,
        prefetch: int = 2,
        multistep_forcings: int = 0,
        batch_sampler=None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.multistep_forcings = multistep_forcings

    def _load_one(self, spec):
        return self.dataset[spec]

    def _index_batches(self) -> Iterator[list]:
        if self.batch_sampler is not None:
            yield from iter(self.batch_sampler)
            return
        batch = []
        for spec in self.sampler:
            batch.append(spec)
            if len(batch) == self.batch_size:
                yield batch
                batch = []

    def _build_batch(self, specs, pool) -> dict:
        samples = list(pool.map(self._load_one, specs))
        out = _collate(samples)
        if self.multistep_forcings > 0 and getattr(self.dataset, "forcings", None):
            steps = self.multistep_forcings
            seqs = []
            for s, (_, d) in zip(specs, [sm[1] for sm in samples]):
                idx = s[0] if isinstance(s, tuple) else s
                delta10 = float(d) * 10
                per_step = []
                for i in range(steps):
                    j = int(idx + (i + 1) * delta10 // 6)
                    j = min(j, len(self.dataset.files) - 1)
                    f = self.dataset.get_forcings(j)
                    per_step.append(self.dataset.standardize_x(f))
                seqs.append(np.stack(per_step, 0))
            out["forcings_seq"] = np.stack(seqs, 0).astype(np.float32)
        return out

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            try:
                for specs in self._index_batches():
                    if stop.is_set():
                        break
                    q.put(self._build_batch(specs, pool))
                q.put(None)
            except BaseException as e:  # propagate to the consumer
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
