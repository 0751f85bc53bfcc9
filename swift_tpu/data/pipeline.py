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
from typing import Iterator, Optional

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

    Fast path: when ``use_pack`` (default auto) and ``<root>/<split>.pack``
    exists, single-step residual batches are assembled by the native C++
    loader (swift_tpu.native) — mmap gather + fused standardize/residual,
    ~100x the per-sample h5 path. Mixed-delta batches (sCM pretraining)
    are served as one native sub-call per distinct delta. Multistep
    (offset>1) and non-residual batches fall back to the h5 path. Missing
    per-sample deltas are drawn once, in the producer thread, so the
    sample stream is deterministic in the dataset seed either way.
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
        use_pack: bool | None = None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.multistep_forcings = multistep_forcings
        self._pack = None
        self._sst_idx = None
        if use_pack is not False and getattr(dataset, "residual", False):
            import os

            pack_path = os.path.join(
                dataset.root, f"{getattr(dataset, 'split', 'train')}.pack"
            )
            if os.path.exists(pack_path):
                try:
                    from swift_tpu.native import PackedDataset

                    self._pack = PackedDataset(pack_path)
                    if "sea_surface_temperature" in dataset.variables:
                        self._sst_idx = dataset.variables.index(
                            "sea_surface_temperature"
                        )
                except Exception:
                    self._pack = None

    def _resolve_specs(self, specs):
        """Normalize specs to (idx, offset, delta), drawing any missing
        delta from the dataset RNG HERE — in the single-threaded producer,
        in batch order. The h5 path used to leave the draw to
        ``dataset[spec]`` inside the worker pool, where thread completion
        order made the delta stream non-reproducible run-to-run (and the
        old pack gate consumed a second set of draws before falling back);
        one draw site makes the stream a pure function of the seed (r5).
        Datasets without interval semantics pass through untouched."""
        ds = self.dataset
        if not hasattr(ds, "intervals") or getattr(ds, "_rng", None) is None:
            return list(specs)
        out = []
        for s in specs:
            if isinstance(s, tuple):
                if len(s) == 3:
                    idx, off, delta = s
                else:
                    (idx, off), delta = s, None
            else:
                idx, off, delta = s, 1, None
            if delta is None:
                delta = int(ds._rng.choice(ds.intervals))
            out.append((int(idx), int(off), int(delta)))
        return out

    def _pack_batch(self, specs) -> Optional[dict]:
        """Native fused batch for single-step resolved specs; None -> h5
        path. The C++ kernel applies ONE t_std per call, so a mixed-delta
        batch (the sCM pretraining case: delta drawn per sample) is served
        as one sub-call per distinct delta (≤3) scattered back in batch
        order — before r5 mixed batches silently fell back to the
        per-sample h5 path (~20× slower end to end), so the fast path
        never fired outside uniform-delta finetune."""
        for s in specs:
            if s[1] != 1:
                return None
        ds = self.dataset
        idx = np.asarray([i for i, _, _ in specs], np.int64)
        deltas = np.asarray([d for _, _, d in specs], np.int64)
        x_out = t_out = None
        for delta in np.unique(deltas):
            m = deltas == delta
            xs, ts = self._pack.batch(
                idx[m], idx[m] + int(delta) // 6, idx[m],
                ds.x_means.reshape(-1), ds.x_stds.reshape(-1),
                ds.t_stds[int(delta)].reshape(-1), len(ds.variables),
            )
            if self._sst_idx is not None and delta != 24:
                xs[..., self._sst_idx] = 0
                ts[..., self._sst_idx] = 0
            if x_out is None:
                x_out = np.empty((len(specs),) + xs.shape[1:], xs.dtype)
                t_out = np.empty((len(specs),) + ts.shape[1:], ts.dtype)
            x_out[m], t_out[m] = xs, ts
        return {
            "x": x_out,
            "t": t_out,
            "idx": idx.astype(np.int32),
            "delta": (deltas.astype(np.float32) / 10.0).reshape(-1, 1),
        }

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
        specs = self._resolve_specs(specs)
        if self._pack is not None and self.multistep_forcings == 0:
            fast = self._pack_batch(specs)
            if fast is not None:
                return fast
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
                    # input-time forcings: step i's input state is at time
                    # idx + i·Δ, so condition on forcings(idx + i·Δ/6h) —
                    # matches the reference (loss.py:387) and this repo's
                    # validate/generate indexing.
                    j = int(idx + i * delta10 // 6)
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
