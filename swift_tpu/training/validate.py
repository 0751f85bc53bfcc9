"""Online/offline rollout validation — lat-weighted RMSE over a forecast.

Parity with reference ``RMSE_rollout`` (src/swift/training/validate.py:23-127):
6-hourly autoregressive rollout to ``target_interval`` steps, recording the
aggregate RMSE and per-channel lat-weighted RMSE at the 6h lead and at each
day boundary, averaged over batches. The reference's per-step h5 forcing
reads (:70-78) are pre-staged; the rollout + metric accumulation is one
jitted scan.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from swift_tpu.data.standardize import Standardizer

NUM_INTERVAL_PER_DAY = 4


def _rollout_rmse_scan(
    param_sampler: Callable,  # (params, cond, key, auxiliary=None) -> Y
    std: Standardizer,
    params,
    X0: jnp.ndarray,  # (B, H, W, C) standardized
    forcings_seq: Optional[jnp.ndarray],  # (B, steps, H, W, F) standardized
    targets: jnp.ndarray,  # (B, days+1, H, W, C) UNstandardized
    w_lat: jnp.ndarray,  # (1, H, 1, 1)
    key: jax.Array,
    target_interval: int,
    residual: bool,
    auxiliary=None,
):
    steps = target_interval
    keys = jax.random.split(key, steps)
    step_ids = np.arange(steps)
    record = ((step_ids + 1) % NUM_INTERVAL_PER_DAY == 0) | (step_ids == 0)
    day = (step_ids + 1) // NUM_INTERVAL_PER_DAY

    xs = {
        "key": keys,
        "record": jnp.asarray(record),
        "day": jnp.asarray(day, jnp.int32),
    }
    if forcings_seq is not None:
        xs["forcing"] = forcings_seq.swapaxes(0, 1)

    C = X0.shape[-1]
    n_days = target_interval // NUM_INTERVAL_PER_DAY + 1
    arr0 = jnp.zeros((C, n_days))

    def body(carry, s):
        X, agg, arr = carry
        cond = jnp.concatenate([X, s["forcing"]], axis=-1) if "forcing" in s else X
        Y = param_sampler(params, cond, s["key"], auxiliary=auxiliary)

        Y_un = std.unstd_t(Y)
        if residual:
            Y_un = std.unstd_x(cond)[..., : std.n_variables] + Y_un
        T_un = jnp.take(targets, s["day"], axis=1)
        err2 = (Y_un - T_un) ** 2

        agg = agg + jnp.where(s["record"], jnp.sqrt(jnp.mean(err2)), 0.0)
        sep = jnp.sqrt(jnp.mean(w_lat * err2, axis=(0, 1, 2)))  # (C,)
        arr = arr + jnp.where(
            s["record"],
            jnp.zeros_like(arr).at[:, s["day"]].set(sep),
            0.0,
        )

        if residual:
            X_next = std.std_x(Y_un)
        else:
            X_next = Y
        return (X_next, agg, arr), None

    (_, agg, arr), _ = jax.lax.scan(body, (X0, jnp.float32(0.0), arr0), xs)
    return agg, arr


def _rollout_crps_scan(
    param_sampler: Callable,  # (params, cond, key, auxiliary=None) -> Y
    std: Standardizer,
    params,
    X0m: jnp.ndarray,  # (M*B, H, W, C) standardized, members tiled outer
    forcings_seq: Optional[jnp.ndarray],  # (B, steps, H, W, F) standardized
    targets: jnp.ndarray,  # (B, days+1, H, W, C) UNstandardized
    w_lat: jnp.ndarray,  # (1, H, 1, 1)
    key: jax.Array,
    target_interval: int,
    residual: bool,
    members: int,
    auxiliary=None,
):
    """Ensemble rollout scoring fair-kernel CRPS per day boundary.

    Same recording schedule as ``_rollout_rmse_scan``; the CRPS formula is
    the fair kernel score of ``eval/metrics.py:lat_weighted_crps``
    (reference eval/metrics.py:68-105) evaluated on-device per channel, so
    a per-tick CRPS trajectory costs no device->host trajectory transfer.
    Members share the IC and differ only in latents (one PRNG key per step
    drawn over the tiled M*B batch)."""
    steps = target_interval
    M = members
    keys = jax.random.split(key, steps)
    step_ids = np.arange(steps)
    record = ((step_ids + 1) % NUM_INTERVAL_PER_DAY == 0) | (step_ids == 0)
    day = (step_ids + 1) // NUM_INTERVAL_PER_DAY

    xs = {
        "key": keys,
        "record": jnp.asarray(record),
        "day": jnp.asarray(day, jnp.int32),
    }
    if forcings_seq is not None:
        # member-major tiling to match X0m's (M, B) -> M*B row layout
        fs = forcings_seq.swapaxes(0, 1)  # (steps, B, H, W, F)
        xs["forcing"] = jnp.tile(fs, (1, M) + (1,) * (fs.ndim - 2))

    B = X0m.shape[0] // M
    C = X0m.shape[-1]
    n_days = target_interval // NUM_INTERVAL_PER_DAY + 1
    arr0 = jnp.zeros((C, n_days))
    w_vec = w_lat.reshape(1, 1, -1, 1, 1)  # (1, 1, H, 1, 1) over (M,B,H,W,C)

    def body(carry, s):
        X, agg, arr = carry
        cond = jnp.concatenate([X, s["forcing"]], axis=-1) if "forcing" in s else X
        Y = param_sampler(params, cond, s["key"], auxiliary=auxiliary)

        Y_un = std.unstd_t(Y)
        if residual:
            Y_un = std.unstd_x(cond)[..., : std.n_variables] + Y_un
        pred = Y_un.reshape(M, B, *Y_un.shape[1:])  # (M, B, H, W, C)
        T_un = jnp.take(targets, s["day"], axis=1)  # (B, H, W, C)

        # fair kernel CRPS per channel (eval/metrics.py:61-75 semantics)
        err = jnp.abs(pred - T_un[None]) * w_vec
        err_c = err.mean(axis=(0, 1, 2, 3))  # (C,)
        spread = jnp.abs(pred[:, None] - pred[None, :]) * w_vec[None]
        # mean over (H, W), sum over member pairs, / 2M(M-1), mean over B
        spread_c = spread.mean(axis=(3, 4)).sum(axis=(0, 1)) / (
            2 * M * (M - 1)
        )  # (B, C)
        crps_c = err_c - spread_c.mean(axis=0)  # (C,)

        agg = agg + jnp.where(s["record"], crps_c.mean(), 0.0)
        arr = arr + jnp.where(
            s["record"],
            jnp.zeros_like(arr).at[:, s["day"]].set(crps_c),
            0.0,
        )

        if residual:
            X_next = std.std_x(Y_un)
        else:
            X_next = Y
        return (X_next, agg, arr), None

    (_, agg, arr), _ = jax.lax.scan(body, (X0m, jnp.float32(0.0), arr0), xs)
    return agg, arr


def CRPS_rollout(
    param_sampler: Callable,
    params,
    batches,
    dataset,
    target_interval: int,
    key: jax.Array,
    members: int = 4,
    num_batches: Optional[int] = None,
    auxiliary=None,
):
    """Ensemble-CRPS analogue of ``RMSE_rollout`` (beyond-reference: the
    reference's online val is RMSE-only, validate.py:23-127; its CRPS lives
    only in offline eval). Returns (aggregate CRPS, per-channel-per-day
    array) averaged over batches, with ``members`` latent draws per IC."""
    assert members >= 2, "kernel CRPS needs at least 2 members"
    std = Standardizer.from_dataset(dataset)
    residual = getattr(dataset, "residual", False)
    lat, _ = dataset.get_lat_lon()
    w_lat = np.cos(np.deg2rad(lat))
    w_lat = (w_lat / w_lat.mean()).reshape(1, -1, 1, 1).astype(np.float32)

    agg_total = 0.0
    arr_total = None
    count = 0
    jitted = jax.jit(
        partial(_rollout_crps_scan, param_sampler, std),
        static_argnames=("target_interval", "residual", "members"),
    )
    for X, TS, idx in batches:
        forc = None
        if dataset.forcings:
            forc = np.stack(
                [
                    np.stack(
                        [
                            np.asarray(
                                dataset.standardize_x(dataset.get_forcings(int(j) + i))
                            )
                            for i in range(target_interval)
                        ],
                        0,
                    )
                    for j in np.atleast_1d(idx)
                ],
                0,
            ).astype(np.float32)
        Xm = np.repeat(np.asarray(X)[None], members, axis=0).reshape(
            members * X.shape[0], *X.shape[1:]
        )
        agg, arr = jitted(
            params,
            jnp.asarray(Xm),
            None if forc is None else jnp.asarray(forc),
            jnp.asarray(TS),
            jnp.asarray(w_lat),
            key,
            target_interval=target_interval,
            residual=residual,
            members=members,
            auxiliary=auxiliary,
        )
        agg_total += float(agg)
        arr_np = np.asarray(arr)
        arr_total = arr_np if arr_total is None else arr_total + arr_np
        count += 1
        if num_batches is not None and count >= num_batches:
            break

    return agg_total / count, arr_total / count


def RMSE_rollout(
    param_sampler: Callable,
    params,
    batches,
    dataset,
    target_interval: int,
    key: jax.Array,
    num_batches: Optional[int] = None,
    auxiliary=None,
):
    """Host driver: iterates rollout batches, prefetches forcings, runs the
    jitted scan, averages over batches.

    ``param_sampler(params, cond, key, auxiliary)`` — parameters are passed
    through the jit boundary explicitly (never closed over; see
    factory.param_sampler_factory). ``batches`` yields (X, TS, idx) with X
    (B, H, W, C) standardized and TS (B, days+1, H, W, C) unstandardized
    (ERA5RollOutDataset layout).
    """
    std = Standardizer.from_dataset(dataset)
    residual = getattr(dataset, "residual", False)
    lat, _ = dataset.get_lat_lon()
    w_lat = np.cos(np.deg2rad(lat))
    w_lat = (w_lat / w_lat.mean()).reshape(1, -1, 1, 1).astype(np.float32)

    agg_total = 0.0
    arr_total = None
    count = 0
    jitted = jax.jit(
        partial(_rollout_rmse_scan, param_sampler, std),
        static_argnames=("target_interval", "residual"),
    )
    for X, TS, idx in batches:
        forc = None
        if dataset.forcings:
            forc = np.stack(
                [
                    np.stack(
                        [
                            np.asarray(
                                dataset.standardize_x(dataset.get_forcings(int(j) + i))
                            )
                            for i in range(target_interval)
                        ],
                        0,
                    )
                    for j in np.atleast_1d(idx)
                ],
                0,
            ).astype(np.float32)
        agg, arr = jitted(
            params,
            jnp.asarray(X),
            None if forc is None else jnp.asarray(forc),
            jnp.asarray(TS),
            jnp.asarray(w_lat),
            key,
            target_interval=target_interval,
            residual=residual,
            auxiliary=auxiliary,
        )
        agg_total += float(agg)
        arr_np = np.asarray(arr)
        arr_total = arr_np if arr_total is None else arr_total + arr_np
        count += 1
        if num_batches is not None and count >= num_batches:
            break

    return agg_total / count, arr_total / count


def main(argv=None):
    """Offline checkpoint evaluation CLI (reference validate.py:130-191):
    ``python -m swift_tpu.training.validate --input <run_dir>
    [--batch N] [--samples N] [--target_interval 56]``."""
    import argparse
    import os
    import random

    from swift_tpu import config as cfglib
    from swift_tpu import factory
    from swift_tpu.data.samplers import AttributeSubset
    from swift_tpu.sampling.factory import param_sampler_factory
    from swift_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
    from swift_tpu.utils.io import (
        log0,
        setup_compilation_cache,
        start_device_keepalive,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="Input run directory")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--samples", type=int, default=-1)
    p.add_argument("--target_interval", type=int, default=56,
                   help="number of 6-hour intervals to predict ahead")
    p.add_argument("--solver", type=str, default="dpm")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    setup_compilation_cache()
    start_device_keepalive()
    cfg = cfglib.resolve_interpolations(
        cfglib.load_config(os.path.join(args.input, ".hydra", "config.yaml"))
    )
    dataset = factory.build_rollout_dataset(
        cfg["data"], args.target_interval, split="test"
    )
    n = len(dataset) if args.samples == -1 else args.samples
    strt = random.Random(args.seed).randint(0, max(len(dataset) - n, 0))
    subset = AttributeSubset(dataset, list(range(strt, strt + n)))

    precond = factory.build_precond(
        cfg["precond"], cfg["model"], dataset.img_resolution,
        dataset.n_target_channels, dataset.n_condition_channels,
        sigma_max_override=float("inf"),
    )
    import jax

    params = precond.init(jax.random.PRNGKey(0))
    ckpt = latest_checkpoint(os.path.join(args.input, "checkpoints"))
    assert ckpt, "no checkpoints found"
    ema = load_checkpoint(ckpt, {"ema": params})["ema"]
    sampler = param_sampler_factory(
        args.solver, precond, **(cfg.get("solver") or {})
    )

    def batches():
        import numpy as np

        for b0 in range(0, len(subset), args.batch):
            chunk = [subset[i] for i in range(b0, min(b0 + args.batch, len(subset)))]
            yield (
                np.stack([c[0] for c in chunk]),
                np.stack([c[1] for c in chunk]),
                np.asarray([c[2] for c in chunk]),
            )

    agg, arr = RMSE_rollout(
        sampler, ema, batches(), dataset, args.target_interval,
        jax.random.PRNGKey(args.seed),
    )
    log0(f"aggregate rmse: {agg}")
    for v, row in zip(dataset.variables, arr):
        log0(f"rmse[{v}]: {[round(float(x), 4) for x in row]}")
    return agg, arr


if __name__ == "__main__":
    main()
