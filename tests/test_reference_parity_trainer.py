"""Trainer-bookkeeping golden parity vs the reference's OWN Trainer code.

The last reference math surface without value-level parity (r4 VERDICT
missing #2): LR warmup+cosine (reference trainer.py:202-217), the nan/±1e5
gradient clamp (:223-231), and the EMA half-life ramp (:237-245). Each test
drives the reference ``Trainer._backward_step`` — the executing reference
code, not a transcription — on a tiny torch net and compares value-for-value
against the swift_tpu product functions (``lr_schedule``, ``clamp_grads``,
``ema_update`` — the exact code the jitted train step calls).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.reference_import import import_reference

import jax
import jax.numpy as jnp
import optax

from swift_tpu.training.trainer import clamp_grads, ema_update, lr_schedule


class _Lin(torch.nn.Module):
    """One 4-vector parameter; loss = (w · g).sum() gives grad == g exactly."""

    def __init__(self, w0):
        super().__init__()
        self.w = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float32))


def _make_ref_trainer(w0, lr, **kwargs):
    swift = import_reference()
    from swift.training.trainer import Trainer as RefTrainer

    net = _Lin(w0)
    opt = torch.optim.SGD(net.parameters(), lr=lr)
    defaults = dict(
        total_kimg=100,
        ema_halflife_kimg=1,
        ema_rampup_ratio=0.05,
        lr_rampup_kimg=10,
        lr_min_factor=0.01,
        lr_cosine_anneal=True,
        kimg_per_tick=50,
        checkpoint_ticks=None,
        device="cpu",
        amp_type=None,
        compile=False,
        val_ticks=None,
    )
    gb = kwargs.pop("global_batch_size", 64)
    defaults.update(kwargs)
    tr = RefTrainer(net, opt, loss_fn=None, **defaults)
    # set by the reference train() loop from the loader (trainer.py:318);
    # _backward_step reads it for the EMA beta.
    tr.global_batch_size = gb
    return tr, net, opt


GB = 64


def test_lr_schedule_value_parity():
    """LR at warmup/cosine/clamped-progress points: reference
    _backward_step's param-group update vs the optax schedule that
    factory.build_optimizer installs (same base_lr/min_factor/kimg)."""
    base_lr = 0.02
    total_kimg, rampup_kimg, min_factor = 100, 10, 0.01
    tr, net, opt = _make_ref_trainer(
        [1.0, 2.0, 3.0, 4.0], base_lr,
        total_kimg=total_kimg, lr_rampup_kimg=rampup_kimg,
        lr_min_factor=min_factor, lr_cosine_anneal=True,
    )
    ours = lr_schedule(
        base_lr, GB, lr_rampup_kimg=rampup_kimg, total_kimg=total_kimg,
        lr_min_factor=min_factor, lr_cosine_anneal=True,
    )
    # nimg grid: step 0, mid-warmup, warmup edge, mid-cosine, end, past end.
    # rtol 3e-6: our schedule evaluates in fp32 inside the jitted step, the
    # reference in python fp64.
    for nimg in [0, GB, 4992, 9984, 10048, 50048, 99968, 100032, 120000]:
        nimg -= nimg % GB  # optax counts whole updates
        loss = (net.w * torch.zeros(4)).sum()
        tr._backward_step(nimg, loss)
        ref_lr = opt.param_groups[0]["lr"]
        our_lr = float(ours(nimg // GB))
        np.testing.assert_allclose(our_lr, ref_lr, rtol=3e-6, err_msg=f"nimg={nimg}")


def test_lr_schedule_no_anneal_holds_last_warmup_value():
    """With annealing OFF the reference stops touching the group lr at the
    end of warmup, so it HOLDS the last warmup-step value (slightly below
    base_lr on the gb step grid) — multistep finetune runs in this mode.
    Contiguous run from 0 across the warmup edge, value-for-value."""
    base_lr = 0.02
    tr, net, opt = _make_ref_trainer(
        [0.0, 0.0, 0.0, 0.0], base_lr, lr_cosine_anneal=False,
        total_kimg=100, lr_rampup_kimg=1,  # warmup = 1000 nimg = 15.6 steps
    )
    ours = lr_schedule(
        base_lr, GB, lr_rampup_kimg=1, total_kimg=100,
        lr_min_factor=0.01, lr_cosine_anneal=False,
    )
    for count in range(40):  # crosses warmup at count 16
        loss = (net.w * torch.zeros(4)).sum()
        tr._backward_step(count * GB, loss)
        np.testing.assert_allclose(
            float(ours(count)), opt.param_groups[0]["lr"], rtol=3e-6,
            err_msg=f"count={count}",
        )


def test_lr_schedule_resume_offset_in_warmup():
    """A resumed run's schedule count restarts at 0; the resume_kimg offset
    must land it on the same warmup lr as the reference at equal nimg."""
    base_lr = 0.02
    tr, net, opt = _make_ref_trainer(
        [0.0, 0.0, 0.0, 0.0], base_lr, lr_cosine_anneal=True,
        total_kimg=100, lr_rampup_kimg=10,
    )
    ours = lr_schedule(
        base_lr, GB, lr_rampup_kimg=10, total_kimg=100,
        lr_min_factor=0.01, lr_cosine_anneal=True, resume_kimg=5,
    )
    for count in [0, 10, 50, 500, 1000]:
        nimg = 5000 + count * GB
        loss = (net.w * torch.zeros(4)).sum()
        tr._backward_step(nimg, loss)
        np.testing.assert_allclose(
            float(ours(count)), opt.param_groups[0]["lr"], rtol=3e-6,
            err_msg=f"count={count}",
        )


def test_grad_clamp_and_ema_trajectory_parity():
    """50 SGD steps with injected NaN/±Inf grads: the reference
    _backward_step's (clamp -> SGD -> EMA-with-ramp) trajectory vs the
    product clamp_grads/optax-sgd/ema_update chain, value-for-value on both
    the weights and the EMA at every step."""
    w0 = [0.5, -1.0, 2.0, 0.25]
    lr = 0.01
    halflife_kimg, rampup = 1, 0.05
    # constant LR in the reference: warmup disabled + no anneal
    tr, net, opt = _make_ref_trainer(
        w0, lr, lr_rampup_kimg=0, lr_cosine_anneal=False,
        ema_halflife_kimg=halflife_kimg, ema_rampup_ratio=rampup,
        global_batch_size=GB,
    )

    params = jnp.asarray(w0, jnp.float32)
    ema = params
    sgd = optax.sgd(lr)
    opt_state = sgd.init(params)

    rng = np.random.default_rng(0)
    for step in range(50):
        g = rng.normal(size=4).astype(np.float32)
        if step % 7 == 1:
            g[0] = np.nan
        if step % 7 == 3:
            g[1] = np.inf
        if step % 7 == 5:
            g[2] = -np.inf
        nimg = step * GB

        # reference: loss = w·g  =>  grad = g (incl. nan/inf)
        opt.zero_grad(set_to_none=True)
        loss = (net.w * torch.tensor(g)).sum()
        tr._backward_step(nimg, loss)

        # ours: the product functions the jitted step_fn calls
        cg = clamp_grads(jnp.asarray(g))
        updates, opt_state = sgd.update(cg, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, jnp.float32(nimg), float(GB),
                         halflife_kimg, rampup)

        np.testing.assert_allclose(
            np.asarray(params), net.w.detach().numpy(), rtol=1e-6,
            err_msg=f"weights diverged at step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(ema), tr.ema.w.detach().numpy(), rtol=1e-6,
            err_msg=f"EMA diverged at step {step}",
        )


def test_ema_rampup_disabled_parity():
    """ema_rampup_ratio=None: beta fixed at 0.5^(gb/halflife) from step 0."""
    w0 = [1.0, 1.0, -1.0, 0.0]
    tr, net, opt = _make_ref_trainer(
        w0, 0.05, lr_rampup_kimg=0, lr_cosine_anneal=False,
        ema_halflife_kimg=2, ema_rampup_ratio=None,
    )
    params = jnp.asarray(w0, jnp.float32)
    ema = params
    sgd = optax.sgd(0.05)
    opt_state = sgd.init(params)
    rng = np.random.default_rng(3)
    for step in range(10):
        g = rng.normal(size=4).astype(np.float32)
        opt.zero_grad(set_to_none=True)
        tr._backward_step(step * GB, (net.w * torch.tensor(g)).sum())
        updates, opt_state = sgd.update(clamp_grads(jnp.asarray(g)),
                                        opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, jnp.float32(step * GB), float(GB),
                         2, None)
    np.testing.assert_allclose(np.asarray(ema), tr.ema.w.detach().numpy(),
                               rtol=1e-6)
