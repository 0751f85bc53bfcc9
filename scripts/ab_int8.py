"""int8 accuracy A/B: forecast RMSE/CRPS from a TRAINED checkpoint, fp vs
--int8 (PERF.md lever (e) acceptance run).

The random-weight deviation number (4.1% rel-RMS, probe_int8_accuracy.py)
bounds the kernel error but says nothing about forecast skill. This script
produces the skill evidence a config-of-record swap needs, at the fidelity
this machine allows (synthetic data — no real ERA5 here):

1. train the hd128 flagship for --kimg kimg on the synthetic full-res
   dataset (checkpoints ON — reuses an existing run dir when present);
2. ``swift_tpu.generate`` twice from the SAME checkpoint and seed: bf16 and
   ``--int8`` (dynamic int8 qkv/FFN);
3. ``build_truth_zarr`` over the test split, ``eval.metrics.evaluate`` on
   both forecasts, print per-variable RMSE/CRPS side by side + rel deltas.

Usage: python scripts/ab_int8.py [--kimg 3] [--members 8] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = "era5-swinv2-1.4-scm-hd128"


def ensure_trained(args) -> str:
    from scripts.bench_generate import CACHE

    root = os.path.join(CACHE, "data")
    run_id = f"abint8-{args.kimg}k"
    out_dir = os.path.join("results", EXP, run_id)
    ckpt = os.path.join(
        out_dir, "checkpoints", f"checkpoint-{args.kimg:06d}.npz"
    )
    if os.path.exists(ckpt) and not args.force:
        print(f"[int8-ab] reusing trained {out_dir}", flush=True)
        return out_dir
    env = dict(os.environ, RUN_ID=run_id)
    cmd = [
        sys.executable, "-m", "swift_tpu.train",
        f"experiment={EXP}",
        f"data.dataset.root={root}",
        f"data.batch_size={args.batch}",
        "data.data_workers=8",
        f"trainer.total_kimg={args.kimg}",
        "trainer.kimg_per_tick=1",
        "trainer.checkpoint_ticks=1",
        "trainer.val_ticks=null",
        "trainer.lr_rampup_kimg=1",
    ]
    # a previous partial run (e.g. a cut session) leaves intermediate
    # checkpoints; resume in place instead of restarting from scratch.
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if not args.force and os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        print(f"[int8-ab] resuming partial run {out_dir}", flush=True)
        cmd.append(f"resume={run_id}")
    print(f"[int8-ab] {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return out_dir


def generate_one(run_dir: str, int8: bool, args) -> str:
    from swift_tpu import generate as gen

    tag = "int8" if int8 else "fp"
    out = os.path.join(run_dir, "output", tag)
    argv = [
        "--input", run_dir,
        "--output", out,
        "--members", str(args.members),
        "--steps", str(args.steps),
        "--batch", str(args.gen_batch),
        "--samples", str(args.samples),
        "--interval", "6",
        "--segment", str(args.steps),
        "--seed", "0",
    ] + (["--int8"] if int8 else [])
    gen.main(gen.parser.parse_args(argv))
    stores = sorted(
        os.path.join(out, d) for d in os.listdir(out) if d.endswith(".zarr")
    )
    assert stores, f"no forecast store under {out}"
    return stores[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kimg", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--gen-batch", type=int, default=2)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from scripts.bench_generate import CACHE, setup

    setup()
    run_dir = ensure_trained(args)

    from swift_tpu import config as cfglib
    from swift_tpu import factory
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.eval.metrics import evaluate

    truth = os.path.join(CACHE, "truth.zarr")
    if not os.path.exists(os.path.join(truth, ".zattrs")):
        cfg = cfglib.load_config(os.path.join(run_dir, ".hydra",
                                              "config.yaml"))
        cfg = cfglib.resolve_interpolations(cfg)
        ds = factory.build_dataset(cfg["data"], split="test")
        build_truth_zarr(ds, truth, workers=4)

    stores = {
        tag: generate_one(run_dir, tag == "int8", args)
        for tag in ("fp", "int8")
    }
    metrics = {tag: evaluate(truth, s) for tag, s in stores.items()}

    # evaluate() returns a flat {"<metric>_<var>_<lead>h": float} dict.
    print("\n== int8 forecast-skill A/B (same checkpoint, seed, ICs) ==")
    rows = {}
    rels = {"rmse": [], "crps": []}
    for key in sorted(metrics["fp"]):
        mtype = key.split("_", 1)[0]
        if mtype not in ("rmse", "crps"):
            continue
        f, q = float(metrics["fp"][key]), float(metrics["int8"][key])
        rel = (q - f) / max(abs(f), 1e-12)
        rels[mtype].append(rel)
        rows[key] = {"fp": round(f, 5), "int8": round(q, 5),
                     "rel": round(rel, 5)}
        print(f"{key:48s} fp={f:.5f} int8={q:.5f} rel={rel:+.4%}")
    for mtype, vals in rels.items():
        if vals:
            print(f"mean rel delta [{mtype}]: {float(np.mean(vals)):+.4%} "
                  f"(worst {float(np.max(vals)):+.4%} over {len(vals)} "
                  f"var-leads)")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
