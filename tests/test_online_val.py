"""Online validation during training (Trainer._val_step -> RMSE_rollout)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from swift_tpu.data.era5 import ERA5RollOutDataset
from swift_tpu.data.samplers import InfiniteSampler
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.models.precond import PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.training.loss import TrigFlowLoss
from swift_tpu.training.trainer import Trainer

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]
H, W = 8, 16


def test_trainer_online_validation(tmp_path):
    root = make_synthetic_era5(
        str(tmp_path / "data"), VARS, FORCINGS, n_train=12, n_val=16, shape=(H, W)
    )
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * len(VARS) + len(FORCINGS),
        out_channels=len(VARS), window_size=(2, 2), shift_size=(1, 1),
        patch_size=(2, 2), depth=2, dim=32, heads=4, auxiliary_dim=1,
        logvar=True, dtype=jnp.float32,
    )
    precond = PassPrecond(
        model=model, img_resolution=(H, W), img_channels=len(VARS),
        condition_channels=len(VARS) + len(FORCINGS), auxiliary_dim=1,
        sigma_data=1.0,
    )
    loss = TrigFlowLoss(
        precond=precond, lat_dim=H, variables=tuple(VARS),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    val_ds = ERA5RollOutDataset(
        interval=4, root=root, variables=VARS, forcings=FORCINGS,
        residual=True, split="val",
    )
    val_sampler = InfiniteSampler(val_ds, shuffle=True, seed=0)

    def val_batches():
        it = iter(val_sampler)
        while True:
            idxs = [next(it) for _ in range(2)]
            samples = [val_ds[i] for i in idxs]
            yield (
                np.stack([s[0] for s in samples]),
                np.stack([s[1] for s in samples]),
                np.asarray(idxs),
            )

    trainer = Trainer(
        precond, optax.adamw(1e-3), loss, global_batch_size=500,
        total_kimg=1, kimg_per_tick=1, checkpoint_ticks=None,
        val_ticks=1, val_target_interval=4,
        val_variables=["2m_temperature", "geopotential_500"],
        val_crps_members=2,
        solver_kwargs={"num_steps": 2, "sigma_min": 0.02, "sigma_max": 200.0,
                       "auxiliary": 0.6},
        run_dir=str(tmp_path / "run"),
    )

    def train_batches():
        k = jax.random.PRNGKey(0)
        batch = {
            "x": jax.random.normal(k, (4, H, W, len(VARS) + len(FORCINGS))),
            "t": jax.random.normal(jax.random.fold_in(k, 1), (4, H, W, len(VARS))),
            "idx": jnp.arange(4, dtype=jnp.int32),
            "delta": jnp.full((4, 1), 0.6),
        }
        while True:
            yield batch

    trainer.train(train_batches(), val_batches, val_ds)
    val_log = tmp_path / "run" / "val_stats.jsonl"
    assert val_log.exists()
    lines = [json.loads(l) for l in open(val_log)]
    assert lines, "no validation records written"
    rec = lines[0]
    assert "val/rmse" in rec and np.isfinite(rec["val/rmse"])
    assert any(k.startswith("val/rmse/2m_temperature") for k in rec)
    days = rec["val/rmse/2m_temperature"]
    assert len(days) == 4 // 4 + 1 and all(np.isfinite(v) for v in days)
    # opt-in online ensemble CRPS (val_crps_members=2)
    assert "val/crps" in rec and np.isfinite(rec["val/crps"])
    cdays = rec["val/crps/2m_temperature"]
    assert len(cdays) == 4 // 4 + 1 and all(np.isfinite(v) for v in cdays)


def test_crps_rollout_matches_eval_metrics(tmp_path):
    """CRPS_rollout's on-device fair-kernel CRPS must equal
    eval.metrics.lat_weighted_crps (reference eval/metrics.py:68-105)
    applied to the same replicated rollout, channel by channel."""
    from swift_tpu.data.standardize import Standardizer
    from swift_tpu.eval.metrics import lat_weighted_crps
    from swift_tpu.training.validate import CRPS_rollout

    root = make_synthetic_era5(
        str(tmp_path / "data"), VARS, FORCINGS, n_train=12, n_val=16, shape=(H, W)
    )
    val_ds = ERA5RollOutDataset(
        interval=8, root=root, variables=VARS, forcings=FORCINGS,
        residual=True, split="val",
    )
    C = len(VARS)
    M, B, steps = 3, 2, 8

    def stub_sampler(params, cond, key, auxiliary=None):
        base = jnp.tanh(cond[..., :C]) * 0.3
        return base + 0.2 * jax.random.normal(key, base.shape)

    samples = [val_ds[i] for i in range(B)]
    X = np.stack([s[0] for s in samples])
    TS = np.stack([s[1] for s in samples])
    idx = np.arange(B)

    key = jax.random.PRNGKey(7)
    agg, arr = CRPS_rollout(
        stub_sampler, {}, [(X, TS, idx)], val_ds,
        target_interval=steps, key=key, members=M, num_batches=1,
    )
    n_days = steps // 4 + 1
    assert arr.shape == (C, n_days)
    assert np.isfinite(agg) and np.all(np.isfinite(arr))

    # --- replicate the ensemble rollout in a plain host loop -------------
    std = Standardizer.from_dataset(val_ds)
    lat, _ = val_ds.get_lat_lon()
    forc = np.stack(
        [
            np.stack(
                [np.asarray(val_ds.standardize_x(val_ds.get_forcings(int(j) + i)))
                 for i in range(steps)], 0)
            for j in idx
        ], 0,
    ).astype(np.float32)
    Xm = jnp.asarray(
        np.repeat(X[None], M, axis=0).reshape(M * B, *X.shape[1:]))
    keys = jax.random.split(key, steps)
    expected = np.zeros((C, n_days))
    for s in range(steps):
        fstep = jnp.asarray(np.tile(forc[:, s], (M, 1, 1, 1)))
        cond = jnp.concatenate([Xm, fstep], axis=-1)
        Y = stub_sampler({}, cond, keys[s])
        Y_un = std.unstd_t(Y)
        Y_un = std.unstd_x(cond)[..., : std.n_variables] + Y_un
        if (s + 1) % 4 == 0 or s == 0:
            day = (s + 1) // 4
            pred = np.asarray(Y_un).reshape(M, B, H, W, C)
            for c in range(C):
                expected[c, day] += lat_weighted_crps(
                    pred[..., c].transpose(1, 0, 2, 3),
                    TS[:, day, ..., c], lat,
                )
        Xm = std.std_x(Y_un)

    np.testing.assert_allclose(arr, expected, rtol=2e-4, atol=1e-5)
    # aggregate = sum over recorded steps of the channel-mean CRPS
    np.testing.assert_allclose(agg, expected.mean(axis=0).sum(), rtol=2e-4)
