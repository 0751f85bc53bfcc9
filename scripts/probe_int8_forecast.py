"""Forecast-metric int8-vs-fp A/B on a TRAINED checkpoint (real chip).

PERF.md lever (e)'s acceptance bar: the int8 inference path stays opt-in
until forecast-level RMSE/CRPS evidence exists on trained weights (random
weights — scripts/probe_int8_accuracy.py — only bound the forward
deviation). This probe runs the REAL product path twice — ``swift-generate``
with and without ``--int8`` on the same checkpoint, ICs, and latent seeds —
then scores both stores against the synthetic truth with the golden-parity
eval metrics (tests/test_reference_parity_eval.py certifies them against
/root/reference/src/swift/eval/metrics.py:39-134) and prints per-metric
deltas.

Default checkpoint: the abgeom3k parity-geometry run (2 kimg on synthetic
full-resolution data — see scripts/ab_geometry.py). Usage:

    python scripts/probe_int8_forecast.py [--run results/.../abgeom3k]
        [--members 4] [--steps 8] [--samples 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=os.path.join(
        REPO, "results", "era5-swinv2-1.4-scm", "abgeom3k"))
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import yaml

    import swift_tpu.generate as gen_cli

    cfg = yaml.safe_load(
        open(os.path.join(args.run, ".hydra", "config.yaml")))
    data_root = cfg["data"]["dataset"]["root"]

    stores = {}
    for mode in ("fp", "int8"):
        argv = [
            "--input", args.run,
            "--members", str(args.members),
            "--steps", str(args.steps),
            "--batch", str(args.batch),
            "--samples", str(args.samples),
            "--interval", "6",
            "--seed", "0",
        ] + (["--int8"] if mode == "int8" else [])
        print(f"[int8-ab] generate {mode}: {' '.join(argv)}", flush=True)
        ofile = gen_cli.main(gen_cli.parser.parse_args(argv))
        # keep both stores: generate names by config, not by quant mode
        keep = ofile + (".int8" if mode == "int8" else ".fp")
        if os.path.exists(keep):
            import shutil

            shutil.rmtree(keep, ignore_errors=True)
        os.rename(ofile, keep)
        stores[mode] = keep

    from swift_tpu.data.era5 import ERA5Dataset
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.eval.metrics import evaluate

    ds = ERA5Dataset(
        root=data_root,
        variables=cfg["data"]["dataset"]["variables"],
        split="test",
    )
    truth = os.path.join(args.run, "truth.zarr")
    if not os.path.exists(os.path.join(truth, ".zmetadata")):
        build_truth_zarr(ds, truth, workers=4)

    results = {m: evaluate(truth, s) for m, s in stores.items()}
    print(f"\n== int8 vs fp forecast metrics "
          f"(M={args.members}, steps={args.steps}, ICs={args.samples}) ==")
    keys = sorted(results["fp"])
    rows = []
    for k in keys:
        fp, q = results["fp"][k], results["int8"][k]
        rel = (q - fp) / (abs(fp) + 1e-12)
        rows.append((k, fp, q, rel))
        print(f"{k:55s} fp={fp:9.4f} int8={q:9.4f} rel={rel:+.3%}")
    worst = max(rows, key=lambda r: abs(r[3]))
    rmse_rels = [r[3] for r in rows if "rmse" in r[0]]
    crps_rels = [r[3] for r in rows if "crps" in r[0]]
    summary = {
        "worst": {"metric": worst[0], "rel": worst[3]},
        "mean_rmse_rel": sum(rmse_rels) / max(len(rmse_rels), 1),
        "mean_crps_rel": sum(crps_rels) / max(len(crps_rels), 1),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
