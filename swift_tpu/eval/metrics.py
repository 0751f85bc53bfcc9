"""Offline forecast evaluation: lat-weighted RMSE / fair CRPS / SSR.

CLI parity with the reference (reference: src/swift/eval/metrics.py):
``python -m swift_tpu.eval.metrics --truth truth.zarr --pred forecast.zarr``
walks prediction lead-times × variables × pressure levels, computes
ensemble-mean lat-weighted RMSE (:39-65), fair-kernel CRPS (:68-105) and
spread-skill ratio (:108-134), prints headline Z500/T2M lines, and writes
``evaluation_metrics.json`` next to the prediction store.

Implementation is jax on whatever backend is available (the metric math is
identical); the stores are read with the in-tree zarr_lite reader.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

PRESSURE_LEVEL_VARS = [
    "geopotential",
    "u_component_of_wind",
    "v_component_of_wind",
    "vertical_velocity",
    "wind_speed",
    "temperature",
    "relative_humidity",
    "specific_humidity",
    "vorticity",
    "potential_vorticity",
]

DEFAULT_PRESSURE_LEVELS = [
    50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000,
]


def _w_lat(lat: np.ndarray) -> np.ndarray:
    w = np.cos(np.deg2rad(lat))
    return (w / w.mean()).astype(np.float32)


def lat_weighted_rmse(pred, y, lat) -> float:
    """Ensemble-mean lat-weighted RMSE. pred: (B, [N,] H, W); y: (B, H, W).
    Mean over batch of per-sample sqrt of lat-weighted MSE (reference
    metrics.py:39-65)."""
    pred = jnp.asarray(pred)
    y = jnp.asarray(y)
    if pred.ndim == 4:
        pred = pred.mean(axis=1)
    err = (pred - y) ** 2
    w = jnp.asarray(_w_lat(lat)).reshape(1, -1, 1)
    return float(jnp.mean(jnp.sqrt(jnp.mean(err * w, axis=(-2, -1)))))


def lat_weighted_crps(pred, y, lat) -> float:
    """Fair kernel CRPS. pred: (B, N, H, W); y: (B, H, W)
    (reference metrics.py:68-105)."""
    pred = jnp.asarray(pred)
    y = jnp.asarray(y)
    N = pred.shape[1]
    w = jnp.asarray(_w_lat(lat))
    H = pred.shape[-2]

    error = jnp.abs(pred - y[:, None]) * w.reshape(1, 1, H, 1)
    error_term = error.mean()

    spread = jnp.abs(pred[:, :, None] - pred[:, None, :]) * w.reshape(1, 1, 1, H, 1)
    spread = spread.mean(axis=(-2, -1)).sum(axis=(1, 2)) / (2 * N * (N - 1))
    return float(error_term - spread.mean())


def lat_weighted_spread_skill_ratio(pred, y, lat) -> float:
    """SSR = spread / ensemble-mean RMSE (reference metrics.py:108-134).
    At lead 0 both spread and skill are ~0 (members share the analysis);
    define 0/0 as 0 so the metric stays finite."""
    pred = jnp.asarray(pred)
    rmse = lat_weighted_rmse(pred, y, lat)
    w = jnp.asarray(_w_lat(lat)).reshape(1, -1, 1)
    var = jnp.var(pred, axis=1, ddof=1)  # (B, H, W)
    spread = float(jnp.sqrt(jnp.mean(var * w, axis=(-2, -1))).mean())
    if rmse <= 1e-12:
        return 0.0 if spread <= 1e-12 else float("inf")
    return spread / rmse


def evaluate(truth_path: str, pred_path: str, device: str | None = None) -> dict:
    from swift_tpu.utils.zarr_lite import open_group

    truth = open_group(truth_path)
    pred = open_group(pred_path)

    lat = np.asarray(truth["latitude"])
    truth_times = np.asarray(truth["time"])
    init_times = np.asarray(pred["time"])
    pred_td = np.asarray(pred["prediction_timedelta"])

    time_to_idx = {t: i for i, t in enumerate(truth_times)}
    init_idxs = np.array([time_to_idx[t] for t in init_times])
    dt_truth = (truth_times[1] - truth_times[0]).astype("timedelta64[h]").astype(int)

    coord_names = {"time", "latitude", "longitude", "level", "number",
                   "prediction_timedelta"}
    data_vars = [v for v in pred.array_names() if v not in coord_names]
    level_values = (
        np.asarray(pred["level"]).tolist()
        if "level" in pred
        else DEFAULT_PRESSURE_LEVELS
    )

    all_metrics: dict[str, float] = {}
    for j, delta in enumerate(pred_td):
        lead_h = delta.astype("timedelta64[h]").astype(int)
        offset = int(lead_h) // int(dt_truth)
        tgt_idxs = init_idxs + offset
        if tgt_idxs.max() >= len(truth_times):
            continue

        for var in data_vars:
            p_full = pred[var]
            is_level = var in PRESSURE_LEVEL_VARS and len(p_full.shape) == 6
            if is_level:
                n_levels = p_full.shape[3]
                p_block = p_full[:, :, j : j + 1][:, :, 0]  # (B, N, L, H, W)
                t_block = np.stack([truth[var][int(i)] for i in tgt_idxs])
                # per-variable levels attr wins over the shared level coord.
                var_levels = p_full.attrs.get("levels", level_values)
                for lvl in range(n_levels):
                    pressure = var_levels[lvl] if lvl < len(var_levels) else lvl
                    name = f"{var}_{pressure}"
                    p_arr = p_block[:, :, lvl]
                    t_arr = t_block[:, lvl]
                    _update(all_metrics, name, lead_h, p_arr, t_arr, lat)
            else:
                p_arr = p_full[:, :, j : j + 1][:, :, 0]  # (B, N, H, W)
                t_arr = np.stack([truth[var][int(i)] for i in tgt_idxs])
                _update(all_metrics, var, lead_h, p_arr, t_arr, lat)

        for nm, val in all_metrics.items():
            if nm.endswith(f"_{lead_h}h") and any(
                k in nm for k in ("geopotential_500", "2m_temperature")
            ):
                print(f"{nm}: {val:.4f}")

    return all_metrics


def _update(metrics, name, lead_h, p_arr, t_arr, lat):
    metrics[f"rmse_{name}_{lead_h}h"] = lat_weighted_rmse(p_arr, t_arr, lat)
    if p_arr.shape[1] > 1:
        metrics[f"crps_{name}_{lead_h}h"] = lat_weighted_crps(p_arr, t_arr, lat)
        metrics[f"ssr_{name}_{lead_h}h"] = lat_weighted_spread_skill_ratio(
            p_arr, t_arr, lat
        )


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("--truth", required=True, help="truth zarr store")
    p.add_argument("--pred", required=True, help="prediction zarr store")
    args = p.parse_args(args)

    from swift_tpu.utils.io import start_device_keepalive

    start_device_keepalive()
    t0 = time.time()
    metrics = evaluate(args.truth, args.pred)
    print(f"evaluated in {time.time() - t0:.2f}s")

    out = os.path.join(os.path.dirname(args.pred), "evaluation_metrics.json")
    # restructure: metric -> lead -> var (reference metrics.py:229-267)
    nested: dict = {}
    for key, val in metrics.items():
        mtype, rest = key.split("_", 1)
        var, lead = rest.rsplit("_", 1)
        nested.setdefault(mtype, {}).setdefault(lead, {})[var] = val
    with open(out, "w") as f:
        json.dump(nested, f, indent=2)
    print(f"metrics written to {out}")
    return metrics


if __name__ == "__main__":
    main()
