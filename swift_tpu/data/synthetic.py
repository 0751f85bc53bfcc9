"""Synthetic ERA5-shaped dataset generator for tests and benchmarks.

Writes the exact on-disk layout the reference training data uses
(per-timestep h5 files with an ``input/`` group, ``normalize_*.npz`` stats,
``lat.npy``/``lon.npy`` — reference src/swift/data/era5.py:33,64-74,88-108 and
src/swift/data/process_one_step_era5.py:238-239), so the full data path can be
exercised without real WeatherBench2 downloads.
"""

from __future__ import annotations

import os
import zlib

import numpy as np


def make_synthetic_era5(
    root: str,
    variables: list[str],
    forcings: list[str] | None = None,
    n_train: int = 16,
    n_val: int = 8,
    n_test: int = 8,
    shape: tuple[int, int] = (8, 16),
    seed: int = 0,
    intervals: tuple[int, ...] = (6, 12, 24),
    start_time: str = "2000-01-01T00:00",
) -> str:
    import h5py

    forcings = list(forcings or [])
    rng = np.random.default_rng(seed)
    H, W = shape
    all_vars = list(variables) + forcings

    os.makedirs(root, exist_ok=True)
    t0 = np.datetime64(start_time)

    counts = {"train": n_train, "val": n_val, "test": n_test}
    global_idx = 0
    for split, n in counts.items():
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            path = os.path.join(d, f"2000_{i:04d}.h5")
            with h5py.File(path, "w") as f:
                grp = f.create_group("input")
                for v in all_vars:
                    # smooth-ish fields with a per-variable offset so
                    # standardize round-trips are non-trivial
                    base = float(zlib.crc32(v.encode()) % 7)  # deterministic across processes
                    field = base + rng.normal(size=(H, W)).astype(np.float32)
                    grp.create_dataset(v, data=field)
                ts = t0 + np.timedelta64(6 * global_idx, "h")
                grp.create_dataset("time", data=np.bytes_(str(ts)))
            global_idx += 1

    means = {v: np.float32(float(zlib.crc32(v.encode()) % 7)) for v in all_vars}
    stds = {v: np.float32(1.0) for v in all_vars}
    np.savez(os.path.join(root, "normalize_mean.npz"), **means)
    np.savez(os.path.join(root, "normalize_std.npz"), **stds)
    for itv in intervals:
        np.savez(
            os.path.join(root, f"normalize_diff_std_{itv}.npz"),
            **{v: np.float32(np.sqrt(2.0)) for v in variables},
        )
    np.save(os.path.join(root, "lat.npy"), np.linspace(-90, 90, H).astype(np.float32))
    np.save(
        os.path.join(root, "lon.npy"),
        np.linspace(0, 360, W, endpoint=False).astype(np.float32),
    )
    return root
