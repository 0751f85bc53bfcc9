"""Ground-truth zarr builder: per-timestep h5 -> WB2-layout truth store.

Equivalent of the reference h5->zarr converter (reference:
src/swift/data/h52zarr.py:85-112, which uses dask+xarray): builds the
``--truth`` input for ``swift_tpu.eval.metrics`` with per-variable arrays
shaped (time, [level], latitude, longitude), using the in-tree zarr_lite
writer and a thread pool over timesteps.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from swift_tpu.data.constants import compress_variables
from swift_tpu.data.era5 import ERA5Dataset
from swift_tpu.utils import zarr_lite
from swift_tpu.utils.io import get_logger

logger = get_logger(__name__)


def build_truth_zarr(
    dataset: ERA5Dataset,
    ofile: str,
    indices=None,
    time_chunk: int = 8,
    workers: int = 8,
) -> str:
    """Write unstandardized truth fields for ``indices`` (default: all)."""
    if indices is None:
        indices = list(range(len(dataset.files)))
    n = len(indices)
    lat, lon = dataset.get_lat_lon()
    n_lat, n_lon = len(lat), len(lon)

    time_coord = np.array(
        [dataset.get_time(int(i)) for i in indices], dtype="datetime64[ns]"
    )

    g = zarr_lite.open_group(ofile, mode="w")
    g.create_array("time", (n,), (n,), time_coord.dtype, fill_value=None,
                   dims=["time"], data=time_coord)
    g.create_array("latitude", (n_lat,), (n_lat,), lat.dtype, fill_value=None,
                   dims=["latitude"], data=lat)
    g.create_array("longitude", (n_lon,), (n_lon,), lon.dtype, fill_value=None,
                   dims=["longitude"], data=lon)

    compressed = compress_variables(dataset.variables)
    has_levels = any(len(lv) for lv in compressed.values())
    if has_levels:
        level_sets = [lv for lv in compressed.values() if lv]
        if all(lv == level_sets[0] for lv in level_sets):
            levels = np.asarray(level_sets[0], np.int32)
        else:
            levels = np.arange(max(len(lv) for lv in level_sets), dtype=np.int32)
        g.create_array("level", (len(levels),), (len(levels),), "<i4",
                       fill_value=None, dims=["level"], data=levels)

    arrays = {}
    for var, levels in compressed.items():
        if levels:
            shape = (n, len(levels), n_lat, n_lon)
            chunks = (time_chunk, len(levels), n_lat, n_lon)
            dims = ["time", "level", "latitude", "longitude"]
        else:
            shape = (n, n_lat, n_lon)
            chunks = (time_chunk, n_lat, n_lon)
            dims = ["time", "latitude", "longitude"]
        attrs = {"levels": list(levels)} if levels else None
        # single-writer offline tool: clear stale chunks from a previous
        # same-layout run so a crashed rerun can't mix old and new data.
        arrays[var] = g.create_array(var, shape, chunks, "<f4",
                                     fill_value=0.0, dims=dims, attrs=attrs,
                                     overwrite_chunks=True)

    def load(i):
        return dataset._load_file(dataset.files[int(i)], dataset.variables)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for t0 in range(0, n, time_chunk):
            block_idx = indices[t0 : t0 + time_chunk]
            fields = list(pool.map(load, block_idx))  # each (H, W, C)
            block = np.stack(fields, 0)  # (T, H, W, C)
            c0 = 0
            for var, levels in compressed.items():
                k = max(len(levels), 1)
                sel = block[..., c0 : c0 + k]  # (T, H, W, k)
                if levels:
                    arrays[var][t0 : t0 + len(block_idx)] = sel.transpose(0, 3, 1, 2)
                else:
                    arrays[var][t0 : t0 + len(block_idx)] = sel[..., 0]
                c0 += k
    g.consolidate_metadata()
    logger.info(f"truth zarr written: {ofile}")
    return ofile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--variables", nargs="+", required=True)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    ds = ERA5Dataset(root=args.root, variables=args.variables, split=args.split)
    build_truth_zarr(ds, args.out, workers=args.workers)


if __name__ == "__main__":
    main()
