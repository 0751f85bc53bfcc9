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


def run_packed(dataset, pack_path: str, batch_size: int, n_batches: int) -> dict:
    """Benchmark the native C++ packed loader on the same access pattern."""
    from swift_tpu.native import PackedDataset

    pd = PackedDataset(pack_path)
    nv = len(dataset.variables)
    x_mean = dataset.x_means.reshape(-1)
    x_std = dataset.x_stds.reshape(-1)
    t_std = dataset.t_stds[6].reshape(-1)
    rng = np.random.default_rng(0)
    n = len(pd) - 4

    idx = rng.integers(0, n, size=batch_size)
    pd.batch(idx, idx + 1, idx, x_mean, x_std, t_std, nv)  # warmup
    t0 = time.perf_counter()
    for _ in range(n_batches):
        idx = rng.integers(0, n, size=batch_size)
        pd.batch(idx, idx + 1, idx, x_mean, x_std, t_std, nv)
    wall = time.perf_counter() - t0
    pd.close()
    return {
        "batches_per_sec": n_batches / wall,
        "samples_per_sec": n_batches * batch_size / wall,
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
    p.add_argument("--pack", action="store_true",
                   help="also benchmark the native packed loader "
                        "(<root>/<split>.pack; created if missing)")
    args = p.parse_args()

    import os

    from swift_tpu.data.era5 import ERA5Dataset

    ds = ERA5Dataset(
        root=args.root, variables=args.variables, forcings=args.forcings,
        split=args.split, residual=True,
    )
    out = run(ds, args.batch, args.batches, args.workers)
    print(
        f"h5 loader: {out['batches_per_sec']:.2f} batches/s, "
        f"{out['samples_per_sec']:.1f} samples/s over {args.batches} batches"
    )
    if args.pack:
        pack_path = os.path.join(args.root, f"{args.split}.pack")
        if not os.path.exists(pack_path):
            from swift_tpu.native.pack import pack_split

            pack_split(ds, pack_path)
        pk = run_packed(ds, pack_path, args.batch, args.batches)
        print(
            f"native packed loader: {pk['batches_per_sec']:.2f} batches/s, "
            f"{pk['samples_per_sec']:.1f} samples/s "
            f"({pk['samples_per_sec'] / out['samples_per_sec']:.1f}x)"
        )


if __name__ == "__main__":
    main()
