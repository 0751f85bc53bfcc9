"""Real-product-path generate benchmark (round-1 VERDICT item #3).

Runs ``swift_tpu.generate`` END-TO-END — config load, h5 dataset +
Standardizer, forcings staged from disk, compiled EnsembleRollout, zarr
store writes — at the bench shapes (12 members × 60 steps @6h, flagship
SwinV2 on 128×256, 69+3 channels) over ``--samples`` initial conditions,
and reports steps/s/chip to put next to bench.py's device-only number.

Usage (on the TPU host):
    python scripts/bench_generate.py [--samples 8] [--batch 2] [--fresh]

The synthetic full-resolution dataset (~0.9 GB) and the random-weights
run dir are cached under .cache/bench_gen and reused across runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache", "bench_gen")


def setup(n_test: int = 72, n_train: int = 48):
    """Synthetic 1.4°-shaped dataset + flagship run dir (idempotent).

    n_train must exceed the 24h-interval lookahead (4 steps) for the train
    split to be non-empty; 48 gives bench_train.py some sample variety."""
    from swift_tpu import config as cfglib
    from swift_tpu.data.constants import FORCING_VARS, default_variables_69
    from swift_tpu.data.synthetic import make_synthetic_era5

    root = os.path.join(CACHE, "data")
    markers = [
        os.path.join(root, "test", f"2000_{n_test - 1:04d}.h5"),
        os.path.join(root, "train", f"2000_{n_train - 1:04d}.h5"),
    ]
    if not all(os.path.exists(m) for m in markers):
        print(f"building synthetic 128x256 dataset at {root} ...", flush=True)
        make_synthetic_era5(
            root, default_variables_69(), list(FORCING_VARS),
            n_train=n_train, n_val=8, n_test=n_test, shape=(128, 256),
        )

    run_dir = os.path.join(CACHE, "run")
    ckpt = os.path.join(run_dir, "checkpoints", "checkpoint-000001.npz")
    cfg_path = os.path.join(run_dir, ".hydra", "config.yaml")
    if not (os.path.exists(ckpt) and os.path.exists(cfg_path)):
        print("building flagship run dir + random checkpoint ...", flush=True)
        os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
        cfg = cfglib.compose(
            "train", overrides=["experiment=era5-swinv2-1.4-scm"],
        )
        cfg["data"]["dataset"]["root"] = root
        cfglib.save_config(cfg, cfg_path)

        import jax

        from swift_tpu import factory
        from swift_tpu.utils.checkpoint import save_checkpoint

        cfg = cfglib.resolve_interpolations(cfg)
        dataset = factory.build_dataset(cfg["data"], split="test")
        precond = factory.build_precond(
            cfg["precond"], cfg["model"], dataset.img_resolution,
            dataset.n_target_channels, dataset.n_condition_channels,
        )
        shapes = jax.eval_shape(lambda: precond.init(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(0)
        params = jax.tree_util.tree_map(
            lambda s: (0.02 * rng.standard_normal(s.shape)).astype(np.float32),
            shapes,
        )
        save_checkpoint(ckpt, {"ema": params})
    return run_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--members", type=int, default=12)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--segment", type=int, default=10)
    ap.add_argument("--dump", type=str, default="zarr")
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild the cached dataset/run dir")
    args = ap.parse_args()

    if args.fresh and os.path.exists(CACHE):
        import shutil

        shutil.rmtree(CACHE)

    run_dir = setup()

    from swift_tpu import generate as gen

    gen_args = gen.parser.parse_args([
        "--input", run_dir,
        "--members", str(args.members),
        "--steps", str(args.steps),
        "--batch", str(args.batch),
        "--samples", str(args.samples),
        "--interval", "6",
        "--dump", args.dump,
        "--segment", str(args.segment),
    ])
    t0 = time.time()
    gen.main(gen_args)
    wall = time.time() - t0
    n = args.samples * args.members * args.steps
    print(
        f"END-TO-END: {n} forecast steps in {wall:.1f}s total "
        f"(incl. setup/compile) — see the 'Done!' line above for the "
        f"rollout-only rate the bench compares against."
    )


if __name__ == "__main__":
    main()
