"""WeatherBench2 -> per-timestep h5 dataset builder.

Equivalent of the reference builder (reference:
src/swift/data/process_one_step_era5.py): writes one ``{year}_{idx:04}.h5``
per timestep with an ``input/`` group (one (H, W) dataset per variable plus
a ``time`` string), ``lat.npy``/``lon.npy`` (:238-239), and train/val/test
splits, parallelized over timesteps.

Source readers (auto-detected):
  * xarray (netCDF / any zarr) when installed;
  * the in-tree zarr_lite reader for zarr-v2 stores with no/zlib compression
    (this environment has no xarray/zarr — blosc-compressed WB2 stores need
    a one-time recompress elsewhere).

CLI:
  python -m swift_tpu.data.process_one_step_era5 --source wb2.zarr \
      --out /data/era5_h5 --variables 2m_temperature ... \
      --splits train=0.8 val=0.1 test=0.1
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class _ZarrLiteSource:
    """(time, [level], lat, lon) arrays from a zarr-v2 store."""

    def __init__(self, path: str, variables: list[str]):
        from swift_tpu.data.constants import compress_variables
        from swift_tpu.utils.zarr_lite import open_group

        self.g = open_group(path)
        self.lat = np.asarray(self.g["latitude"])
        self.lon = np.asarray(self.g["longitude"])
        self.times = np.asarray(self.g["time"])
        self.variables = variables
        self.compressed = compress_variables(variables)

    def __len__(self):
        return len(self.times)

    def fields(self, t_idx: int) -> dict[str, np.ndarray]:
        out = {}
        for base, levels in self.compressed.items():
            arr = self.g[base]
            if levels:
                store_levels = arr.attrs.get("levels", levels)
                block = arr[t_idx]  # (L, H, W)
                for lvl in levels:
                    out[f"{base}_{lvl}"] = block[store_levels.index(lvl)]
            else:
                out[base] = arr[t_idx]
        return out

    def time(self, t_idx: int) -> str:
        return str(self.times[t_idx])


class _XarraySource:
    def __init__(self, path: str, variables: list[str]):
        import xarray as xr

        from swift_tpu.data.constants import compress_variables

        self.ds = xr.open_zarr(path) if path.endswith(".zarr") else xr.open_dataset(path)
        self.lat = self.ds["latitude"].values
        self.lon = self.ds["longitude"].values
        self.times = self.ds["time"].values
        self.compressed = compress_variables(variables)

    def __len__(self):
        return len(self.times)

    def fields(self, t_idx: int) -> dict[str, np.ndarray]:
        out = {}
        for base, levels in self.compressed.items():
            da = self.ds[base].isel(time=t_idx)
            if levels:
                for lvl in levels:
                    out[f"{base}_{lvl}"] = da.sel(level=lvl).values
            else:
                out[base] = da.values
        return out

    def time(self, t_idx: int) -> str:
        return str(self.times[t_idx])


def open_source(path: str, variables: list[str]):
    try:
        import xarray

        # a stub module under the "xarray" name (e.g. the placeholder the
        # reference-parity test harness installs so the reference imports)
        # is not a usable reader — fall through to the zarr_lite source.
        if not hasattr(xarray, "open_zarr"):
            raise ImportError("xarray present but not functional")
        return _XarraySource(path, variables)
    except ImportError:
        return _ZarrLiteSource(path, variables)


def write_timestep(source, out_dir: str, t_idx: int, file_idx: int, year: str):
    import h5py

    path = os.path.join(out_dir, f"{year}_{file_idx:04d}.h5")
    fields = source.fields(t_idx)
    with h5py.File(path, "w") as f:
        grp = f.create_group("input")
        for name, arr in fields.items():
            grp.create_dataset(name, data=np.asarray(arr, np.float32))
        grp.create_dataset("time", data=np.bytes_(source.time(t_idx)))
    return path


def build(source_path: str, out_root: str, variables: list[str],
          splits: dict[str, float], workers: int = 8):
    src = open_source(source_path, variables)
    n = len(src)
    os.makedirs(out_root, exist_ok=True)
    np.save(os.path.join(out_root, "lat.npy"), np.asarray(src.lat, np.float32))
    np.save(os.path.join(out_root, "lon.npy"), np.asarray(src.lon, np.float32))

    # contiguous chronological splits (matching the reference's year-based
    # train/val/test partitioning).
    bounds = []
    start = 0
    for name, frac in splits.items():
        end = min(n, start + int(round(frac * n)))
        bounds.append((name, start, end))
        start = end
    if bounds:
        bounds[-1] = (bounds[-1][0], bounds[-1][1], n)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, s, e in bounds:
            d = os.path.join(out_root, name)
            os.makedirs(d, exist_ok=True)
            futures = [
                pool.submit(write_timestep, src, d, t, t - s,
                            str(np.datetime64(src.time(s), "Y")) if s < n else "0000")
                for t in range(s, e)
            ]
            for f in futures:
                f.result()
            print(f"{name}: {e - s} timesteps")

    _write_stats(out_root, variables, splits)
    return out_root


def _write_stats(out_root: str, variables: list[str], splits,
                 intervals=(6, 12, 24), max_samples: int = 512):
    """Compute normalize_mean/std and per-interval residual stds from the
    train split (reference derives these offline; same file layout,
    era5.py:88-108)."""

    import h5py
    from glob import glob

    files = sorted(glob(os.path.join(out_root, "train", "*.h5")))
    if not files:
        return
    sel = files[:: max(1, len(files) // max_samples)]

    sums = {v: 0.0 for v in variables}
    sqs = {v: 0.0 for v in variables}
    count = 0
    fields_cache = []
    for path in sel:
        with h5py.File(path, "r") as f:
            fields = {v: np.asarray(f["input"][v][()], np.float64) for v in variables}
        fields_cache.append(fields)
        for v in variables:
            sums[v] += np.nanmean(fields[v])
            sqs[v] += np.nanmean(fields[v] ** 2)
        count += 1
    means = {v: np.float32(sums[v] / count) for v in variables}
    stds = {
        v: np.float32(max(np.sqrt(sqs[v] / count - (sums[v] / count) ** 2), 1e-8))
        for v in variables
    }
    np.savez(os.path.join(out_root, "normalize_mean.npz"), **means)
    np.savez(os.path.join(out_root, "normalize_std.npz"), **stds)

    for itv in intervals:
        k = itv // 6
        diffs = {v: [] for v in variables}
        for i in range(0, min(len(files) - k, max_samples)):
            with h5py.File(files[i], "r") as f0, h5py.File(files[i + k], "r") as f1:
                for v in variables:
                    a = np.asarray(f0["input"][v][()], np.float64)
                    b = np.asarray(f1["input"][v][()], np.float64)
                    diffs[v].append(np.nanstd(b - a))
        np.savez(
            os.path.join(out_root, f"normalize_diff_std_{itv}.npz"),
            **{v: np.float32(max(np.mean(d), 1e-8)) for v, d in diffs.items()},
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="WB2 zarr / netCDF path")
    p.add_argument("--out", required=True)
    p.add_argument("--variables", nargs="+", required=True)
    p.add_argument("--splits", nargs="+", default=["train=0.8", "val=0.1", "test=0.1"])
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    splits = {}
    for s in args.splits:
        k, v = s.split("=")
        splits[k] = float(v)
    build(args.source, args.out, args.variables, splits, args.workers)


if __name__ == "__main__":
    main()
