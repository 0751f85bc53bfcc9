"""Data-loader throughput benchmark (reference: src/swift/data/benchmark.py:82-93).

Times the BatchLoader over N batches and prints batches/sec and samples/sec.

CLI: python -m swift_tpu.data.benchmark --root <h5 root> --variables ... \
    [--batch 256] [--batches 24] [--workers 4]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(dataset, batch_size: int, n_batches: int, workers: int) -> dict:
    from swift_tpu.data.pipeline import BatchLoader
    from swift_tpu.data.samplers import InfiniteSampler

    sampler = InfiniteSampler(dataset, shuffle=True, seed=0)
    loader = BatchLoader(dataset, sampler, batch_size, num_workers=workers)
    it = iter(loader)
    next(it)  # warmup (spins up the thread pool)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        batch = next(it)
    wall = time.perf_counter() - t0
    return {
        "batches_per_sec": n_batches / wall,
        "samples_per_sec": n_batches * batch_size / wall,
        "batch_shape": {k: list(np.shape(v)) for k, v in batch.items()},
        "wall": wall,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--variables", nargs="+", required=True)
    p.add_argument("--forcings", nargs="+", default=[])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    from swift_tpu.data.era5 import ERA5Dataset

    ds = ERA5Dataset(
        root=args.root, variables=args.variables, forcings=args.forcings,
        split=args.split, residual=True,
    )
    out = run(ds, args.batch, args.batches, args.workers)
    print(
        f"{out['batches_per_sec']:.2f} batches/s, "
        f"{out['samples_per_sec']:.1f} samples/s over {args.batches} batches"
    )


if __name__ == "__main__":
    main()
