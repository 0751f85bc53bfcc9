"""Per-tick val-CRPS trajectories for the convergence-suite legs.

r4 VERDICT weak #3 asked for "val-CRPS alongside RMSE" in the geometry
A/B: the product online val (like the reference's, validate.py:23-127) is
RMSE-only, so this script post-processes the per-tick checkpoints the
suite retains (checkpoint_ticks=1) with ``CRPS_rollout`` — an on-device
fair-kernel ensemble CRPS (eval/metrics.py:68-105 semantics) over the val
split. Same val protocol as the Trainer (dpm solver, EMA weights); fixed
ICs and PRNG key per tick index so legs are comparable point-for-point.

Usage (after scripts/ab_convergence.py --kimg K):
    python scripts/crps_trajectory.py [--kimg 10] [--members 4]
        [--interval 8] [--batch 4]
Writes ABCRPS_{K}k.json and prints the combined RMSE+CRPS table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPS = ("era5-swinv2-1.4-scm", "era5-swinv2-1.4-scm-hd128")
HEADS = ("2m_temperature", "geopotential_500")


def leg_trajectory(run_dir: str, args) -> dict:
    import jax

    from swift_tpu import config as cfglib
    from swift_tpu import factory
    from swift_tpu.data.samplers import AttributeSubset
    from swift_tpu.sampling.factory import param_sampler_factory
    from swift_tpu.training.validate import CRPS_rollout
    from swift_tpu.utils.checkpoint import get_ckpt_num, load_checkpoint

    cfg = cfglib.resolve_interpolations(
        cfglib.load_config(os.path.join(run_dir, ".hydra", "config.yaml"))
    )
    val_ds = factory.build_rollout_dataset(
        cfg["data"], args.interval, split="val"
    )
    precond = factory.build_precond(
        cfg["precond"], cfg["model"], val_ds.img_resolution,
        val_ds.n_target_channels, val_ds.n_condition_channels,
        sigma_max_override=float("inf"),
    )
    template = precond.init(jax.random.PRNGKey(0))
    sampler = param_sampler_factory("dpm", precond, **(cfg.get("solver") or {}))

    # fixed, evenly spaced ICs — identical across legs and ticks
    n = min(args.batch, len(val_ds))
    ics = list(np.linspace(0, len(val_ds) - 1, n).astype(int))
    subset = AttributeSubset(val_ds, ics)
    samples = [subset[i] for i in range(len(subset))]
    batch = (
        np.stack([s[0] for s in samples]),
        np.stack([s[1] for s in samples]),
        np.asarray(ics),
    )

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    ckpts = sorted(
        (os.path.join(ckpt_dir, f) for f in os.listdir(ckpt_dir)
         if f.endswith(".npz")),
        key=get_ckpt_num,
    )
    out = {"kimg": [], "val_crps": [], **{f"val_crps/{v}": [] for v in HEADS}}
    variables = list(val_ds.variables)
    for tick, ckpt in enumerate(ckpts):
        ema = load_checkpoint(ckpt, {"ema": template})["ema"]
        agg, arr = CRPS_rollout(
            sampler, ema, [batch], val_ds, args.interval,
            jax.random.PRNGKey(1000 + tick), members=args.members,
            num_batches=1,
        )
        del ema
        out["kimg"].append(get_ckpt_num(ckpt))
        out["val_crps"].append(round(float(agg), 5))
        for v in HEADS:
            if v in variables:
                days = arr[variables.index(v)]
                out[f"val_crps/{v}"].append(
                    [round(float(x), 5) for x in days]
                )
        print(f"[crps] {os.path.basename(run_dir)} kimg={out['kimg'][-1]} "
              f"crps={out['val_crps'][-1]}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kimg", type=int, default=10)
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--interval", type=int, default=8,
                    help="rollout length in 6h steps (8 = 2 days)")
    ap.add_argument("--batch", type=int, default=4, help="ICs per leg")
    ap.add_argument("--run-id", default=None,
                    help="override the results run id (default abconv{K}k)")
    args = ap.parse_args()

    from swift_tpu.utils.io import setup_compilation_cache, start_device_keepalive

    setup_compilation_cache()
    start_device_keepalive()

    result = {}
    for exp in EXPS:
        run_dir = os.path.join(
            REPO, "results", exp, args.run_id or f"abconv{args.kimg}k")
        assert os.path.isdir(run_dir), f"missing leg {run_dir}"
        result[exp] = leg_trajectory(run_dir, args)
        # pair with the trainer's own per-tick val-RMSE
        vs = os.path.join(run_dir, "val_stats.jsonl")
        if os.path.exists(vs):
            from scripts.ab_convergence import load_rows

            result[exp]["val_rmse"] = [
                round(float(r.get("val/rmse", float("nan"))), 5)
                for r in load_rows(vs)
            ]

    print("\n== per-tick val trajectories (CRPS members="
          f"{args.members}, {args.interval}-step rollout) ==")
    for exp, t in result.items():
        print(f"{exp}: val_rmse {t.get('val_rmse')}")
        print(f"{exp}: val_crps {t['val_crps']}")

    result["provenance"] = (
        f"scripts/crps_trajectory.py --kimg {args.kimg} --members "
        f"{args.members} --interval {args.interval} --batch {args.batch}: "
        "EMA checkpoints from ab_convergence legs, dpm val solver, fixed "
        "ICs/keys per tick"
    )
    path = os.path.join(REPO, f"ABCRPS_{args.kimg}k.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
