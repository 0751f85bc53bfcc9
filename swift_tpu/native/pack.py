"""Pack a per-timestep h5 split into one mmap-able binary for the native
loader: 4 KiB header (magic + int64 dims) followed by the raw float32
(N, H, W, C) tensor, channels ordered variables-then-forcings like the
training condition.

CLI: python -m swift_tpu.native.pack --root <h5 root> --split train \
    --variables ... [--forcings ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from swift_tpu.native import HEADER_BYTES, MAGIC


def pack_split(dataset, out_path: str, chunk: int = 64) -> str:
    """dataset: an ERA5Dataset; writes root/<split>.pack by default."""
    files = dataset.files
    n = len(files)
    sample = dataset._load_file(files[0], dataset.variables + dataset.forcings)
    H, W, C = sample.shape
    header = MAGIC + np.asarray([n, H, W, C], np.int64).tobytes()
    header = header + b"\0" * (HEADER_BYTES - len(header))

    with open(out_path, "wb") as f:
        f.write(header)
        for i in range(0, n, chunk):
            block = np.stack(
                [
                    dataset._load_file(p, dataset.variables + dataset.forcings)
                    for p in files[i : i + chunk]
                ]
            ).astype(np.float32)
            f.write(np.ascontiguousarray(block).tobytes())
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--variables", nargs="+", required=True)
    p.add_argument("--forcings", nargs="+", default=[])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from swift_tpu.data.era5 import ERA5Dataset

    ds = ERA5Dataset(
        root=args.root, variables=args.variables, forcings=args.forcings,
        split=args.split, residual=True,
    )
    out = args.out or os.path.join(args.root, f"{args.split}.pack")
    pack_split(ds, out)
    print(f"packed {len(ds.files)} timesteps -> {out}")


if __name__ == "__main__":
    main()
