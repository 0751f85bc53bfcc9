"""Convergence A/B: hd128 (8x128) vs reference-parity (12x88) geometry.

The accuracy evidence behind the hd128 bench geometry (r3 VERDICT #3): both
geometries train the FULL product loop (real Trainer, packed loader, online
validation) on the same synthetic full-resolution dataset with the same
seed and schedule for --kimg kimg, and the per-tick train-loss and online
val-RMSE trajectories are printed side by side. hd128 changes only the
attention head layout (identical depth/dim/window/patch, same model FLOPs
within 3%), so matching trajectories are the claim "the faster geometry
learns the same" at the fidelity a synthetic A/B can give — the real-data
bar stays in PERF.md.

Usage: python scripts/ab_geometry.py [--kimg 3] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPS = ("era5-swinv2-1.4-scm", "era5-swinv2-1.4-scm-hd128")


def run_one(exp: str, args) -> str:
    from scripts.bench_generate import CACHE

    root = os.path.join(CACHE, "data")
    run_id = f"abgeom{args.kimg}k"
    out_dir = os.path.join("results", exp, run_id)
    if os.path.exists(os.path.join(out_dir, "stats.jsonl")) and not args.force:
        print(f"[ab] reusing existing {out_dir}", flush=True)
        return out_dir
    env = dict(os.environ, RUN_ID=run_id)
    cmd = [
        sys.executable, "-m", "swift_tpu.train",
        f"experiment={exp}",
        f"data.dataset.root={root}",
        f"data.batch_size={args.batch}",
        "data.data_workers=8",
        f"trainer.total_kimg={args.kimg}",
        "trainer.kimg_per_tick=1",
        "trainer.checkpoint_ticks=null",
        "trainer.val_ticks=1",
        f"trainer.val_target_interval={args.val_interval}",
        # identical optimization schedule at A/B scale (the product configs
        # ramp over 2000 kimg — meaningless inside a 3-kimg A/B)
        "trainer.lr_rampup_kimg=1",
    ]
    print(f"[ab] {exp}: {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return out_dir


def load_rows(path):
    if not os.path.exists(path):
        return []
    return [json.loads(line) for line in open(path)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kimg", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--val-interval", type=int, default=4)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from scripts.bench_generate import setup

    setup()

    dirs = {exp: run_one(exp, args) for exp in EXPS}

    # Align on the common tick range: an interrupted leg (the trainer's
    # signal handler checkpoints and exits at the next tick) still yields a
    # valid trajectory comparison over the ticks both legs completed.
    stats = {e: load_rows(os.path.join(dirs[e], "stats.jsonl")) for e in EXPS}
    vals = {e: load_rows(os.path.join(dirs[e], "val_stats.jsonl"))
            for e in EXPS}
    n_tick = min(len(s) for s in stats.values())
    n_val = min(len(v) for v in vals.values())

    print(f"\n== A/B summary (same data, seed, schedule; "
          f"common ticks 0..{n_tick - 1}) ==")
    for exp in EXPS:
        losses = [
            round(
                (r["train/loss"]["mean"]
                 if isinstance(r.get("train/loss"), dict)
                 else r.get("train/loss")), 4)
            for r in stats[exp][:n_tick]
        ]
        print(f"{exp}: per-tick train loss {losses}")
        for r in vals[exp][:n_val]:
            # rows: {"val/tick": t, "val/rmse": agg, "val/rmse/<var>": [per-day]}
            per_var = {
                k.replace("val/rmse/", ""): [round(float(x), 4) for x in v]
                for k, v in r.items()
                if k.startswith("val/rmse/") and isinstance(v, list)
            }
            print(f"  val@tick={r.get('val/tick')}: "
                  f"agg={round(float(r.get('val/rmse', float('nan'))), 4)} "
                  f"{per_var}")
    aggs = {
        e: [round(float(r.get("val/rmse", float("nan"))), 4)
            for r in vals[e][:n_val]]
        for e in EXPS
    }
    print(f"\nagg val-RMSE trajectories: {json.dumps(aggs)}")


if __name__ == "__main__":
    main()
