"""Combined convergence suite: parity bf16 vs hd128 bf16 vs hd128+int8.

One table for any future "geometry/quant of record" decision (r4 VERDICT
next-round #7, extending #2's horizon): both geometries train the FULL
product loop (real Trainer, packed loader, online val every tick,
checkpoints) on the same synthetic full-res dataset with the SAME run-id
(=> same mixed seed), batch and schedule for --kimg kimg; then ensembles
are generated from the FINAL checkpoint of each leg (bf16 for both, plus
--int8 for hd128) and scored with the reference-certified eval pipeline
(RMSE/CRPS/SSR). Output: per-tick train-loss + val-RMSE trajectories and
the final-checkpoint ensemble-skill table, side by side.

Usage: python scripts/ab_convergence.py [--kimg 6] [--batch 16]
       (reuses finished legs; an interrupted leg resumes in place)
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
EXPS = ("era5-swinv2-1.4-scm", "era5-swinv2-1.4-scm-hd128")


def train_one(exp: str, args) -> str:
    from scripts.bench_generate import CACHE

    root = os.path.join(CACHE, "data")
    run_id = f"abconv{args.kimg}k"
    out_dir = os.path.join("results", exp, run_id)
    final_ckpt = os.path.join(
        out_dir, "checkpoints", f"checkpoint-{args.kimg:06d}.npz"
    )
    if os.path.exists(final_ckpt) and not args.force:
        print(f"[conv] reusing finished {out_dir}", flush=True)
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
        "trainer.checkpoint_ticks=1",
        "trainer.val_ticks=1",
        f"trainer.val_target_interval={args.val_interval}",
        # identical optimization schedule at A/B scale (the product configs
        # ramp over 2000 kimg — meaningless inside a small A/B)
        "trainer.lr_rampup_kimg=1",
    ]
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir) and not args.force:
        print(f"[conv] resuming partial {out_dir}", flush=True)
        cmd.append(f"resume={run_id}")
    print(f"[conv] {exp}: {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return out_dir


def generate_one(run_dir: str, tag: str, int8: bool, args) -> str:
    from swift_tpu import generate as gen

    out = os.path.join(run_dir, "output", tag)
    stores = []
    if os.path.isdir(out):
        stores = sorted(
            os.path.join(out, d) for d in os.listdir(out)
            if d.endswith(".zarr")
        )
    if stores and not args.force:
        print(f"[conv] reusing forecast {stores[0]}", flush=True)
        return stores[0]
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


def load_rows(path):
    if not os.path.exists(path):
        return []
    rows = [json.loads(line) for line in open(path)]
    # an aborted in-place resume appends rows that restart the tick count;
    # keep only the original monotonic prefix so trajectories stay aligned.
    out, last = [], -1
    for r in rows:
        t = r.get("val/tick", r.get("train/tick"))
        if isinstance(t, dict):
            t = t.get("mean")
        t = -1 if t is None else float(t)
        if t <= last:
            break
        last = t
        out.append(r)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kimg", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--val-interval", type=int, default=4)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--gen-batch", type=int, default=2)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--run-id", default=None,
                    help="override the results run id (default abconv{K}k); "
                    "lets a re-scoped summary reuse legs trained under a "
                    "different horizon name")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    run_id = args.run_id or f"abconv{args.kimg}k"

    from scripts.bench_generate import CACHE, setup
    from swift_tpu.utils.io import start_device_keepalive

    setup()
    start_device_keepalive()

    dirs = {}
    for exp in EXPS:
        dirs[exp] = (
            os.path.join("results", exp, run_id)
            if args.skip_train else train_one(exp, args)
        )

    # --- trajectories ---------------------------------------------------
    stats = {e: load_rows(os.path.join(dirs[e], "stats.jsonl")) for e in EXPS}
    vals = {e: load_rows(os.path.join(dirs[e], "val_stats.jsonl"))
            for e in EXPS}
    n_tick = min(len(s) for s in stats.values())
    n_val = min(len(v) for v in vals.values())
    print(f"\n== trajectories (same data/seed/schedule; common ticks "
          f"0..{n_tick - 1}) ==")
    traj = {}
    for exp in EXPS:
        losses = [
            round(
                (r["train/loss"]["mean"]
                 if isinstance(r.get("train/loss"), dict)
                 else r.get("train/loss")), 4)
            for r in stats[exp][:n_tick]
        ]
        rmses = [round(float(r.get("val/rmse", float("nan"))), 4)
                 for r in vals[exp][:n_val]]
        traj[exp] = {"train_loss": losses, "val_rmse": rmses}
        print(f"{exp}: train loss {losses}")
        print(f"{exp}: val-RMSE   {rmses}")

    # --- final-checkpoint ensemble skill --------------------------------
    from swift_tpu import config as cfglib
    from swift_tpu import factory
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.eval.metrics import evaluate

    truth = os.path.join(CACHE, "truth.zarr")
    if not os.path.exists(os.path.join(truth, ".zattrs")):
        cfg = cfglib.load_config(
            os.path.join(dirs[EXPS[0]], ".hydra", "config.yaml"))
        cfg = cfglib.resolve_interpolations(cfg)
        ds = factory.build_dataset(cfg["data"], split="test")
        build_truth_zarr(ds, truth, workers=4)

    legs = {
        "parity-bf16": (dirs[EXPS[0]], False),
        "hd128-bf16": (dirs[EXPS[1]], False),
        "hd128-int8": (dirs[EXPS[1]], True),
    }
    metrics = {}
    for tag, (run_dir, int8) in legs.items():
        store = generate_one(run_dir, tag.split("-", 1)[1], int8, args)
        metrics[tag] = evaluate(truth, store)

    print("\n== final-checkpoint ensemble skill "
          f"({args.members}m x {args.samples}i x {args.steps}s @6h) ==")
    summary = {}
    for mtype in ("rmse", "crps", "ssr"):
        means = {
            tag: float(np.mean([v for k, v in m.items()
                                if k.startswith(mtype + "_")]))
            for tag, m in metrics.items()
        }
        summary[mtype] = {t: round(v, 5) for t, v in means.items()}
        print(f"mean {mtype:4s}: " + "  ".join(
            f"{t}={v:.5f}" for t, v in means.items()))
    # headline vars at a mid lead
    heads = {}
    for key in sorted(metrics["parity-bf16"]):
        if key in (
            "rmse_2m_temperature_72h", "crps_2m_temperature_72h",
            "rmse_geopotential_500_72h", "crps_geopotential_500_72h",
        ):
            heads[key] = {t: round(float(m[key]), 5)
                          for t, m in metrics.items()}
            print(f"{key:32s} " + "  ".join(
                f"{t}={v}" for t, v in heads[key].items()))

    out = {"trajectories": traj, "mean_skill": summary,
           "headline_72h": heads,
           "provenance": (
               f"scripts/ab_convergence.py --kimg {args.kimg} --batch "
               f"{args.batch}: full product loop, same run-id seed, "
               "synthetic full-res data; ensembles from final checkpoints")}
    path = os.path.join(REPO, f"ABCONV_{args.kimg}k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
