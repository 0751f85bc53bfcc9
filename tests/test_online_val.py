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
