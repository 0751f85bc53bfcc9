"""Index-stream samplers (deterministic generators, no torch).

Semantics match the reference samplers (src/swift/data/samplers.py:9-97):

  * ``InfiniteSampler`` — rank-strided infinite shuffled stream with
    windowed reshuffling; ``set_offset(steps)`` switches to multistep
    finetune mode, skipping indices whose target would run off the end and
    yielding ``(idx, offset)`` pairs (reference :26-52);
  * ``DeltaBatchSampler`` — one shared Δ per batch, yielding
    ``(idx, offset, delta)`` triples (reference :59-82);
  * ``AttributeSubset`` — attribute-delegating subset (reference :90-97).
"""

from __future__ import annotations

import numpy as np


class InfiniteSampler:
    def __init__(
        self,
        dataset,
        rank: int = 0,
        num_replicas: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        window_size: float = 0.5,
    ):
        assert len(dataset) > 0
        assert num_replicas > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset = dataset
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size
        self.offset = 1
        # files consumed per extra multistep offset at the worst-case Δ.
        # The reference's guard (samplers.py:44) only reserves one step of
        # headroom, which can index past the end for offset>1 with Δ=24h
        # (its own TODO at era5.py:187); reserve the true worst case.
        intervals = getattr(dataset, "intervals", [6])
        self.max_step_files = max(intervals) // 6 if intervals else 1

    def set_offset(self, offset: int):
        """How far ahead to offset the dataset (in steps)."""
        assert isinstance(offset, int) and offset > 0, "offset must be positive"
        self.offset = offset

    def __iter__(self):
        order = np.arange(len(self.dataset))
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.default_rng(self.seed + self.offset - 1)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                if order[i] + (self.offset - 1) * self.max_step_files < order.size:
                    if self.offset > 1:
                        yield (int(order[i]), self.offset)
                    else:
                        yield int(order[i])
            if window >= 2:
                j = (i - rnd.integers(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


class DeltaBatchSampler:
    """Batches an InfiniteSampler stream; every element of a batch shares
    the same randomly-chosen Δ."""

    def __init__(
        self,
        sampler: InfiniteSampler,
        batch_size: int,
        intervals: list[int],
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.sampler = sampler
        self.batch_size = batch_size
        self.intervals = list(intervals)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __iter__(self):
        batch = []
        for elem in self.sampler:
            batch.append(elem)
            if len(batch) == self.batch_size:
                delta = int(self.rng.choice(self.intervals))
                out = []
                for e in batch:
                    if isinstance(e, tuple):
                        idx, offset = e
                    else:
                        idx, offset = e, self.sampler.offset
                    out.append((idx, offset, delta))
                yield out
                batch = []


class AttributeSubset:
    """Subset with attribute delegation to the parent dataset."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def __getattr__(self, attr):
        return getattr(self.dataset, attr)
