"""Utils tests: stats moments, History, profiling hooks, checkpoint misc."""

import json
import os

import numpy as np
import pytest

from swift_tpu.utils import stats
from swift_tpu.utils.checkpoint import get_ckpt_num, latest_checkpoint
from swift_tpu.utils.wandb_utils import History


def test_stats_report_and_collector():
    c = stats.Collector(regex="unit/.*")
    stats.report("unit/a", 1.0)
    stats.report("unit/a", [2.0, 3.0])
    stats.report("unit/b", 10.0)
    c.update()
    assert c.num("unit/a") == 3
    np.testing.assert_allclose(c.mean("unit/a"), 2.0)
    np.testing.assert_allclose(c.std("unit/a"), np.std([1, 2, 3]), rtol=1e-6)
    assert c["unit/b"] == 10.0
    d = c.as_dict()
    assert d["unit/a"]["num"] == 3


def test_check_replica_consistency_single_process():
    import jax.numpy as jnp

    assert stats.check_replica_consistency({"w": jnp.ones((4,))})


def test_profiled_function_runs():
    @stats.profiled_function
    def f(x):
        return x * 2

    assert f(21) == 42


def test_history_accumulates_and_finalizes(tmp_path):
    h = History()
    line = h.update({"train/loss": 1.5, "train/tick": 1})
    assert "train/loss=1.5" in line
    h.update({"train/loss": 1.0, "train/tick": 2})
    path = h.finalize(str(tmp_path))
    data = json.load(open(path))
    assert data["train/loss"] == [1.5, 1.0]


def test_ckpt_name_parsing(tmp_path):
    assert get_ckpt_num("/a/b/checkpoint-001234.npz") == 1234
    d = tmp_path / "checkpoints"
    d.mkdir()
    for k in (2, 10, 9):
        (d / f"checkpoint-{k:06d}.npz").write_bytes(b"x")
    # numeric, not ASCII, ordering (reference helpers.py:11-14)
    assert latest_checkpoint(str(d)).endswith("checkpoint-000010.npz")


def test_trainer_profile_writes_trace(tmp_path):
    import jax.numpy as jnp
    import optax

    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import TrigFlowLoss
    from swift_tpu.training.trainer import Trainer

    Hh, Ww, C = 8, 16, 3
    model = SwinV2(
        img_resolution=(Hh, Ww), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, dtype=jnp.float32,
    )
    p = PassPrecond(model=model, img_resolution=(Hh, Ww), img_channels=C,
                    condition_channels=C, sigma_data=1.0)
    loss = TrigFlowLoss(
        precond=p, lat_dim=Hh,
        variables=("2m_temperature", "geopotential_500", "temperature_850"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    tr = Trainer(p, optax.adamw(1e-3), loss, global_batch_size=1000,
                 total_kimg=1, kimg_per_tick=1, checkpoint_ticks=None,
                 val_ticks=None, run_dir=str(tmp_path), profile=True)
    import jax

    batch = {
        "x": jnp.zeros((4, Hh, Ww, C)),
        "t": jnp.zeros((4, Hh, Ww, C)),
        "idx": jnp.arange(4, dtype=jnp.int32),
        "delta": jnp.full((4, 1), 0.6),
    }

    def batches():
        while True:
            yield batch

    tr.train(batches())
    prof = tmp_path / "profile"
    assert prof.exists() and any(prof.rglob("*")), "no profiler output written"


def test_device_keepalive_starts_and_stops(monkeypatch):
    # the dev-tunnel transport drops idle device connections (~90 s,
    # CLAUDE.md rule 9); entry points hold the handle open with a
    # heartbeat thread. On CPU just verify lifecycle + idempotency.
    import time

    from swift_tpu.utils import io as io_mod

    monkeypatch.setattr(io_mod, "_keepalive_thread", None)
    t = io_mod.start_device_keepalive(0.05)
    assert t is not None and t.is_alive()
    assert io_mod.start_device_keepalive(0.05) is t  # idempotent
    time.sleep(0.2)  # let it beat a few times
    assert t.is_alive()

    monkeypatch.setenv("SWIFT_DEVICE_KEEPALIVE", "0")
    monkeypatch.setattr(io_mod, "_keepalive_thread", None)
    assert io_mod.start_device_keepalive(0.05) is None
