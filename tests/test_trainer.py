"""Trainer tests: overfit-a-batch, EMA, checkpointing, multi-device DP."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from swift_tpu.models.precond import PassPrecond, Network
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.training.loss import TrigFlowLoss
from swift_tpu.training.trainer import (
    Trainer,
    adamw_decay_mask,
    lr_schedule,
    muon_param_labels,
    swin_flop_count,
)
from swift_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

VARS = ("2m_temperature", "geopotential_500", "temperature_850")
H, W, C = 8, 16, 3


def make_precond():
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32,
    )
    return PassPrecond(
        model=model, img_resolution=(H, W), img_channels=C,
        condition_channels=C, auxiliary_dim=1, sigma_data=1.0,
    )


def make_loss(precond):
    return TrigFlowLoss(
        precond=precond, lat_dim=H, variables=VARS,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )


def fixed_batch(B=4):
    k = jax.random.PRNGKey(0)
    return {
        "x": jax.random.normal(k, (B, H, W, C)),
        "t": jax.random.normal(jax.random.fold_in(k, 1), (B, H, W, C)),
        "idx": jnp.arange(B, dtype=jnp.int32),
        "delta": jnp.full((B, 1), 0.6),
    }


def repeat_batches(batch, n=10**9):
    def gen():
        while True:
            yield batch

    return gen()


def test_lr_schedule():
    s = lr_schedule(1.0, global_batch_size=1000, lr_rampup_kimg=10,
                    total_kimg=100, lr_min_factor=0.1, lr_cosine_anneal=True)
    # count=0 -> nimg=0 -> min_lr
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    # count=5 -> nimg=5000 -> halfway through warmup
    np.testing.assert_allclose(float(s(5)), 0.55, rtol=1e-6)
    # end of schedule -> min_lr
    np.testing.assert_allclose(float(s(100)), 0.1, rtol=1e-5)


def test_param_label_fns():
    p = make_precond()
    params = p.init(jax.random.PRNGKey(0))
    labels = muon_param_labels(params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    assert any(v == "muon" for v in flat.values())
    # pos_embed and 1-D params are adam
    assert all(
        v == "adam" for k, v in flat.items() if "pos_embed" in k or "bias" in k
    )
    mask = adamw_decay_mask(params)
    mflat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert mflat["pos_embed"] is False
    assert any("modulation" in k and v for k, v in mflat.items())


def test_swin_flop_count_positive():
    n = swin_flop_count((128, 256), 1, 12, 69 * 2 + 3, 1056, int(8 / 3 * 1056),
                        (2, 2), (16, 16))
    assert n > 1e12  # ~TFLOP scale per sample


def test_overfit_one_batch(tmp_path):
    p = make_precond()
    loss_fn = make_loss(p)
    opt = optax.adamw(1e-3)
    tr = Trainer(
        p, opt, loss_fn, global_batch_size=4, total_kimg=1,
        kimg_per_tick=1, checkpoint_ticks=None, val_ticks=None,
        run_dir=str(tmp_path), seed=0,
    )
    batch = fixed_batch()
    step = tr._get_step(1, None)
    state = tr.state
    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(60):
        state, m = step(state, batch, key)  # same key = same noise draw
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"no descent: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(losses).all()


def test_ema_tracks_params(tmp_path):
    p = make_precond()
    tr = Trainer(
        p, optax.adamw(1e-3), make_loss(p), global_batch_size=4, total_kimg=1,
        run_dir=str(tmp_path), ema_rampup_ratio=None, ema_halflife_kimg=0,
    )
    # halflife 0 -> beta ~ 0 -> ema == params after one step
    step = tr._get_step(1, None)
    state, _ = step(tr.state, fixed_batch(), jax.random.PRNGKey(0))
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state.ema)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_train_loop_ticks_and_checkpoint(tmp_path):
    p = make_precond()
    tr = Trainer(
        p, optax.adamw(1e-3), make_loss(p), global_batch_size=500,
        total_kimg=2, kimg_per_tick=1, checkpoint_ticks=1, val_ticks=None,
        run_dir=str(tmp_path),
    )
    tr.train(repeat_batches(fixed_batch()))
    assert os.path.exists(tmp_path / "stats.jsonl")
    lines = [json.loads(l) for l in open(tmp_path / "stats.jsonl")]
    assert lines and "train/loss" in lines[-1]
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert any(c.startswith("checkpoint-") for c in ckpts)


def test_checkpoint_resume(tmp_path):
    p = make_precond()
    opt = optax.adamw(1e-3)
    tr = Trainer(
        p, opt, make_loss(p), global_batch_size=1000, total_kimg=1,
        kimg_per_tick=1, checkpoint_ticks=1, val_ticks=None,
        run_dir=str(tmp_path),
    )
    tr.train(repeat_batches(fixed_batch()))
    ck = os.path.join(tmp_path, "checkpoints", "checkpoint-000001.npz")
    assert os.path.exists(ck)
    tr2 = Trainer(
        p, opt, make_loss(p), global_batch_size=1000, total_kimg=2,
        run_dir=str(tmp_path), ckpt=ck,
    )
    assert tr2.resume_kimg == 1
    # params identical to saved
    for x, y in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _schedule_counts(opt_state):
    found = []

    def visit(n):
        if isinstance(n, optax.ScaleByScheduleState):
            found.append(int(n.count))
        return n

    jax.tree_util.tree_map(
        visit, opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByScheduleState),
    )
    return found


def test_lr_continuity_across_resume(tmp_path):
    """A full-state resume must not double-count progress in the LR schedule:
    the schedule bakes in resume_kimg AND the restored opt_state carries the
    schedule count — the trainer resets the latter (ADVICE r1 #1)."""
    from swift_tpu.factory import build_optimizer

    p = make_precond()
    params = p.init(jax.random.PRNGKey(0))
    trainer_cfg = {"lr_rampup_kimg": 10, "total_kimg": 100,
                   "lr_min_factor": 0.1, "lr_cosine_anneal": True}
    opt_cfg = {"_target_": "torch.optim.AdamW", "lr": 1.0}

    opt, lr_fn = build_optimizer(opt_cfg, trainer_cfg, 1000, params)
    tr = Trainer(
        p, opt, make_loss(p), global_batch_size=1000, total_kimg=2,
        kimg_per_tick=1, checkpoint_ticks=1, val_ticks=None,
        run_dir=str(tmp_path),
    )
    tr.train(repeat_batches(fixed_batch()))
    assert _schedule_counts(tr.state.opt_state) == [2]  # 2 updates ran
    ck = os.path.join(tmp_path, "checkpoints", "checkpoint-000002.npz")
    assert os.path.exists(ck)

    opt2, lr_fn2 = build_optimizer(opt_cfg, trainer_cfg, 1000, params,
                                   resume_kimg=2)
    tr2 = Trainer(
        p, opt2, make_loss(p), global_batch_size=1000, total_kimg=4,
        run_dir=str(tmp_path), ckpt=ck,
    )
    # restored schedule count reset to 0; resume_kimg carries the offset.
    assert _schedule_counts(tr2.state.opt_state) == [0]
    # effective LR at the first post-resume update continues the ramp:
    # nimg = 2*1000 either way.
    np.testing.assert_allclose(float(lr_fn2(0)), float(lr_fn(2)), rtol=1e-6)
    # Adam's bias-correction count was NOT reset (still 2 steps in).
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(
            tr2.state.opt_state
        )[0]
    }
    adam_counts = [int(v) for k, v in flat.items()
                   if k.endswith("count") and np.ndim(v) == 0 and int(v) > 0]
    assert adam_counts, "Adam step count should survive the restore"


def test_muon_train_step_descends(tmp_path):
    """Full train step with the flagship optimizer (Muon + aux Adam,
    reference param-grouping rule) on a pallas-free tiny model."""
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    p = make_precond()
    opt = muon_with_aux_adam(muon_param_labels, lr=0.02, adam_lr=1e-3)
    tr = Trainer(p, opt, make_loss(p), global_batch_size=4, total_kimg=1,
                 run_dir=str(tmp_path), checkpoint_ticks=None, val_ticks=None)
    step = tr._get_step(1, None)
    state = tr.state
    losses = []
    key = jax.random.PRNGKey(7)
    batch = fixed_batch()
    for _ in range(40):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"muon no descent: {losses[0]} -> {losses[-1]}"


def test_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-training saves a checkpoint and exits cleanly."""
    import signal
    import threading

    p = make_precond()
    tr = Trainer(
        p, optax.adamw(1e-3), make_loss(p), global_batch_size=4,
        total_kimg=10**6, kimg_per_tick=1, checkpoint_ticks=100,
        val_ticks=None, run_dir=str(tmp_path),
    )
    timer = threading.Timer(
        8.0, lambda: signal.raise_signal(signal.SIGTERM)
    )
    timer.start()
    tr.train(repeat_batches(fixed_batch()))
    timer.cancel()
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert ckpts, "no checkpoint written on SIGTERM"


def test_multi_device_dp():
    """Train step over an 8-device data mesh: batch sharded, params replicated."""
    from swift_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(("data",))
    p = make_precond()
    tr = Trainer(
        p, optax.adamw(1e-3), make_loss(p), global_batch_size=8,
        total_kimg=1, run_dir="/tmp/dp_test",
    )
    batch = shard_batch(fixed_batch(B=8), mesh)
    state = jax.tree_util.tree_map(lambda x: x, tr.state)
    state = type(state)(
        replicate(state.params, mesh), replicate(state.ema, mesh),
        replicate(state.opt_state, mesh), state.nimg,
    )
    step = tr._get_step(1, None)
    new_state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # params stay replicated (no accidental sharding)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_grad_accum_matches_manual_mean(tmp_path):
    """grad_accum=A: the jitted step applies the optimizer to the MEAN of
    per-microbatch grads (keys split per microbatch), with activation memory
    scaled to the microbatch. Verified against a manual per-microbatch
    computation with the same key schedule."""
    precond = make_precond()
    loss_fn = make_loss(precond)
    A, B = 2, 4
    tr = Trainer(
        precond, optax.sgd(1e-2), loss_fn, global_batch_size=B,
        total_kimg=1, kimg_per_tick=1, checkpoint_ticks=None, val_ticks=None,
        run_dir=str(tmp_path), grad_accum=A,
    )
    batch = fixed_batch(B)
    key = jax.random.PRNGKey(42)
    state0 = tr.state

    # manual reference BEFORE the donated step invalidates state0 buffers
    params0 = jax.tree_util.tree_map(jnp.copy, state0.params)
    keys = jax.random.split(key, A)
    mbs = jax.tree_util.tree_map(
        lambda a: a.reshape(A, B // A, *a.shape[1:]), batch
    )

    def one(params, i):
        mb = jax.tree_util.tree_map(lambda a: a[i], mbs)
        return loss_fn(params, keys[i], mb["t"], condition=mb["x"],
                       auxiliary=mb["delta"])

    losses, grads = zip(*[
        jax.value_and_grad(one)(params0, i) for i in range(A)
    ])
    gmean = jax.tree_util.tree_map(
        lambda *g: sum(g) / A, *grads
    )
    updates, _ = tr.optimizer.update(gmean, state0.opt_state, params0)
    expected = optax.apply_updates(params0, updates)
    expected_loss = sum(float(l) for l in losses) / A

    step = tr._get_step(1, None)
    new_state, metrics = step(state0, batch, key)
    np.testing.assert_allclose(float(metrics["loss"]), expected_loss,
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grad_accum_descends(tmp_path):
    """A few accumulated steps on a fixed batch reduce the loss (the full
    train-step path: scan over microbatches + EMA + nimg accounting)."""
    precond = make_precond()
    loss_fn = make_loss(precond)
    tr = Trainer(
        precond, optax.adam(1e-3), loss_fn, global_batch_size=4,
        total_kimg=1, kimg_per_tick=1, checkpoint_ticks=None, val_ticks=None,
        run_dir=str(tmp_path), grad_accum=2,
    )
    batch = fixed_batch(4)
    step = tr._get_step(1, None)
    state = tr.state
    first = last = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        last = float(metrics["loss"])
        first = last if first is None else first
    assert last < first
    assert float(state.nimg) == 8 * 4  # nimg counts the FULL batch


def test_grad_accum_multi_device_dp():
    """grad_accum under an 8-device data mesh: the microbatch reshape
    (B,) -> (A, B/A) must keep each microbatch sharded over the data axis
    (B/A still divides the device count) and match the accum=1 DP loss
    semantics (finite loss, replicated params after the step)."""
    from swift_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert jax.device_count() == 8
    mesh = make_mesh(("data",))
    p = make_precond()
    tr = Trainer(
        p, optax.adamw(1e-3), make_loss(p), global_batch_size=16,
        total_kimg=1, run_dir="/tmp/dp_accum_test", grad_accum=2,
    )
    batch = shard_batch(fixed_batch(B=16), mesh)
    state = type(tr.state)(
        replicate(tr.state.params, mesh), replicate(tr.state.ema, mesh),
        replicate(tr.state.opt_state, mesh), tr.state.nimg,
    )
    step = tr._get_step(1, None)
    new_state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_step_non_divisible_latitude(tmp_path):
    """A real Trainer step on a grid whose latitude doesn't divide
    patch x window (the 0.25° WB2 case scaled down: 10 rows, patch 2 x
    window 2 -> the model pads to 12 internally). Regression for the
    0.25-deg config of record, whose train path previously crashed at
    trace time on the 721-row grid."""
    Hn = 10
    model = SwinV2(
        img_resolution=(Hn, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32,
    )
    p = PassPrecond(
        model=model, img_resolution=(Hn, W), img_channels=C,
        condition_channels=C, auxiliary_dim=1, sigma_data=1.0,
    )
    loss_fn = TrigFlowLoss(
        precond=p, lat_dim=Hn, variables=VARS,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    tr = Trainer(
        p, optax.adamw(1e-3), loss_fn, global_batch_size=2, total_kimg=1,
        kimg_per_tick=1, checkpoint_ticks=None, val_ticks=None,
        run_dir=str(tmp_path), seed=0,
    )
    k = jax.random.PRNGKey(0)
    batch = {
        "x": jax.random.normal(k, (2, Hn, W, C)),
        "t": jax.random.normal(jax.random.fold_in(k, 1), (2, Hn, W, C)),
        "idx": jnp.arange(2, dtype=jnp.int32),
        "delta": jnp.full((2, 1), 0.6),
    }
    step = tr._get_step(1, None)
    state, m = step(tr.state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["loss"]))
