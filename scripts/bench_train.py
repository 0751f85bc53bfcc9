"""Real-chip training benchmark at a realistic batch (VERDICT r1 item #6).

Runs the flagship sCM training loop (fwd + jvp-fwd + bwd + Muon) through
the REAL Trainer — ticks, stats.jsonl, online validation and checkpointing
enabled — on synthetic full-resolution data, and reports img/s, tflops and
the dt breakdown.

Usage (on the TPU host):
    python scripts/bench_train.py [--batch 16] [--kimg 3] [--no-val]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache", "bench_gen")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--kimg", type=int, default=3)
    ap.add_argument("--kimg-per-tick", type=int, default=1)
    ap.add_argument("--no-val", action="store_true")
    ap.add_argument("--val-interval", type=int, default=4,
                    help="online-val rollout length (config of record: 8)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--run-id", type=str, default="benchtrain")
    ap.add_argument("--experiment", type=str, default="era5-swinv2-1.4-scm")
    args = ap.parse_args()

    from scripts.bench_generate import setup  # synthetic dataset (cached)

    setup()
    root = os.path.join(CACHE, "data")

    os.environ["RUN_ID"] = args.run_id

    from swift_tpu import train as train_cli

    overrides = [
        f"experiment={args.experiment}",
        f"data.dataset.root={root}",
        f"data.batch_size={args.batch}",
        f"data.data_workers={args.workers}",
        f"trainer.total_kimg={args.kimg}",
        f"trainer.kimg_per_tick={args.kimg_per_tick}",
        "trainer.checkpoint_ticks=2",
        "trainer.val_ticks=null" if args.no_val else "trainer.val_ticks=2",
        f"trainer.val_target_interval={args.val_interval}",
    ]
    train_cli.main(overrides)

    stats = os.path.join(
        "results", args.experiment, args.run_id, "stats.jsonl"
    )
    if os.path.exists(stats):
        lines = [json.loads(l) for l in open(stats)]
        print("== per-tick summary ==")
        for row in lines:
            flat = {
                k: (v["mean"] if isinstance(v, dict) else v)
                for k, v in row.items()
            }
            keep = [
                "train/tick", "train/kimg", "train/loss", "train/tflops",
                "train/dt/tick", "train/dt/data", "train/dt/kimg",
                "train/mem/device", "train/lr",
            ]
            print({k: round(flat[k], 4) for k in keep if k in flat})


if __name__ == "__main__":
    main()
