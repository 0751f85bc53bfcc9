"""Golden parity for the TRAINING-side math against the reference's own code.

Round-2 closed inference parity (forward + sCM forecast vs the real
reference modules); this file closes the remaining transcription-risk
surface (round-2 VERDICT "Next round" #1):

  (a) loss VALUES — EDM / TrigFlow / sCM (incl. distillation + tangent
      warmup) on identical inputs with the noise draws pinned on both sides
      (reference: src/swift/training/loss.py:95-260);
  (b) loss input-gradients — verifies every stop_gradient/detach placement
      (the sCM ``g`` rearrangement detaches F and dF but NOT x_t/dxt_dt,
      reference loss.py:240-241);
  (c) a 5-step Muon + aux-Adam update trajectory vs the reference's
      directly-runnable ``SingleDeviceMuonWithAuxAdam``
      (reference: src/swift/training/optimizers/muon.py:267-338);
  (d) the four solvers that previously only had analytic tests —
      ``edm_sampler``, ``ablation_sampler``, ``dpm_solver``,
      ``dpm_solver_2s`` (+ ``scm_solve2``) vs the reference
      ``DiffusionSampler`` with stochastic draws zeroed
      (reference: src/swift/generating/diffusion.py:10-512).
"""

import contextlib
import importlib
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_import import import_reference
from tests.test_reference_parity import (
    TINY,
    _build_ours,
    _build_reference,
    _convert,
    _inputs,
    _nhwc,
)

import swift_tpu.training.loss as loss_mod
from swift_tpu.models.convert import swinv2_state_dict_to_params
from swift_tpu.models.precond import EDMPrecond, Network
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.sampling import solvers as our_solvers
from swift_tpu.training.optimizers.muon import (
    muon_with_aux_adam,
    newton_schulz,
)

swift_ref = import_reference()
ref_loss_mod = importlib.import_module("swift.training.loss")
ref_muon_mod = importlib.import_module("swift.training.optimizers.muon")

# Three channels of TINY mapped onto real variable names so the reference's
# per-variable weight table (loss.py:35-55) resolves.
TINY_VARS = ["2m_temperature", "geopotential_500", "temperature_850"]


def _fake_dataset(cfg):
    """Duck-typed stand-in for the reference losses' dataset dependency:
    only ``_shape[1]`` (lat dim) and ``variables`` are read."""
    H, W = cfg["img_resolution"]
    return types.SimpleNamespace(_shape=(cfg["img_channels"], H, W), variables=TINY_VARS)


class _DDPShim(torch.nn.Module):
    """Minimal DDP-like wrapper: SCMLoss unconditionally reads ``net.module``
    (reference loss.py:213,217)."""

    def __init__(self, net):
        super().__init__()
        self.module = net

    def forward(self, *a, **k):
        return self.module(*a, **k)


def _pin_noise(monkeypatch, tau_nchw, z_nchw):
    """Pin the noise-level draw and the gaussian draw on BOTH sides to the
    same values (reference draws via self._sampling_fn / torch.randn_like;
    ours via _make_noise_fn / jax.random.normal)."""
    tau_t = torch.from_numpy(tau_nchw)
    z_t = torch.from_numpy(z_nchw)
    monkeypatch.setattr(torch, "randn_like", lambda x: z_t.clone())

    tau_j = jnp.asarray(tau_nchw)  # (B,1,1,1): layout-agnostic
    z_j = jnp.asarray(_nhwc(z_nchw))
    monkeypatch.setattr(
        loss_mod, "_make_noise_fn", lambda noise: lambda key, batch: tau_j
    )
    real_normal = jax.random.normal

    def pinned_normal(key, shape=(), dtype=jnp.float32):
        # only the loss's z-draw (full NHWC batch shape) is pinned; any other
        # draw (e.g. flax initializer shape checks) uses the real sampler.
        if tuple(shape) == z_j.shape:
            return z_j.astype(dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", pinned_normal)
    return tau_t


def _loss_inputs(seed=7):
    x, cond, _, aux = _inputs(TINY, seed=seed)
    rng = np.random.default_rng(seed + 100)
    tau = np.exp(rng.uniform(np.log(0.05), np.log(20.0), (x.shape[0], 1, 1, 1))).astype(
        np.float32
    )
    z = rng.standard_normal(x.shape).astype(np.float32)
    return x, cond, aux, tau, z


def test_edm_loss_value_and_grad_parity(monkeypatch):
    """EDM loss value + d(loss)/dx vs the reference EDMLoss run on the
    reference's own EDMPrecond(SwinV2) (loss.py:95-114)."""
    cfg = dict(TINY, logvar=False)
    torch.manual_seed(0)
    ref_net = swift_ref.models.precond.EDMPrecond(
        model_config={
            "_target_": "swift.models.swinv2.SwinV2",
            "window_size": list(cfg["window_size"]),
            "shift_size": list(cfg["shift_size"]),
            "patch_size": list(cfg["patch_size"]),
            "depth": cfg["depth"],
            "dim": cfg["dim"],
            "heads": cfg["heads"],
            "logvar": False,
        },
        img_resolution=list(cfg["img_resolution"]),
        img_channels=cfg["img_channels"],
        condition_channels=cfg["condition_channels"],
        auxiliary_dim=cfg["auxiliary_dim"],
        sigma_data=0.5,
    )
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in ref_net.parameters():
            if p.count_nonzero() == 0:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))
    ref_net = ref_net.eval()

    model = SwinV2(
        img_resolution=cfg["img_resolution"],
        in_channels=cfg["img_channels"] + cfg["condition_channels"],
        out_channels=cfg["img_channels"],
        window_size=cfg["window_size"],
        shift_size=cfg["shift_size"],
        patch_size=cfg["patch_size"],
        depth=cfg["depth"],
        dim=cfg["dim"],
        heads=cfg["heads"],
        auxiliary_dim=cfg["auxiliary_dim"],
        logvar=False,
        dtype=jnp.float32,
        use_pallas=False,
        scan_layers=True,
    )
    precond = EDMPrecond(
        model=model,
        img_resolution=tuple(cfg["img_resolution"]),
        img_channels=cfg["img_channels"],
        condition_channels=cfg["condition_channels"],
        auxiliary_dim=cfg["auxiliary_dim"],
        sigma_data=0.5,
    )
    params = swinv2_state_dict_to_params(
        ref_net.state_dict(), cfg["depth"], scan_layers=True
    )

    x, cond, aux, sigma, z = _loss_inputs(seed=7)
    _pin_noise(monkeypatch, sigma, z)

    ref_loss = ref_loss_mod.EDMLoss(
        dataset=_fake_dataset(cfg), noise={"dist": "lognormal", "P_mean": 0, "P_std": 1},
        sigma_data=0.5,
    )
    ref_loss._sampling_fn = lambda x: torch.from_numpy(sigma)

    x_t = torch.from_numpy(x).requires_grad_(True)
    ref_val = ref_loss(
        ref_net, x_t, condition=torch.from_numpy(cond),
        auxiliary=torch.from_numpy(aux),
    )
    (ref_gx,) = torch.autograd.grad(ref_val, x_t)

    ours = loss_mod.EDMLoss(
        precond=precond, lat_dim=cfg["img_resolution"][0], variables=tuple(TINY_VARS),
        noise={"dist": "lognormal", "P_mean": 0, "P_std": 1}, sigma_data=0.5,
    )

    def f(xj):
        return ours(
            params, jax.random.PRNGKey(0), xj,
            condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux),
        )

    val, gx = jax.value_and_grad(f)(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-4)
    gx = np.transpose(np.asarray(gx), (0, 3, 1, 2))
    scale = max(np.abs(ref_gx.numpy()).max(), 1e-8)
    np.testing.assert_allclose(gx, ref_gx.numpy(), rtol=1e-3, atol=2e-4 * scale)


def _trigflow_pair(monkeypatch, seed=8):
    ref_net = _build_reference(TINY)
    precond = _build_ours(TINY, scan_layers=True)
    params = _convert(ref_net, TINY, scan_layers=True)
    x, cond, aux, tau, z = _loss_inputs(seed=seed)
    _pin_noise(monkeypatch, tau, z)
    return ref_net, precond, params, x, cond, aux, tau


def test_trigflow_loss_value_and_grad_parity(monkeypatch):
    """TrigFlow loss with the adaptive logvar head engaged (loss.py:117-160)."""
    ref_net, precond, params, x, cond, aux, tau = _trigflow_pair(monkeypatch)

    ref_loss = ref_loss_mod.TrigFlowLoss(
        dataset=_fake_dataset(TINY),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200},
        sigma_data=1.0,
    )
    ref_loss._sampling_fn = lambda x: torch.from_numpy(tau)

    x_t = torch.from_numpy(x).requires_grad_(True)
    ref_val = ref_loss(
        ref_net, x_t, condition=torch.from_numpy(cond),
        auxiliary=torch.from_numpy(aux),
    )
    (ref_gx,) = torch.autograd.grad(ref_val, x_t)

    ours = loss_mod.TrigFlowLoss(
        precond=precond, lat_dim=TINY["img_resolution"][0], variables=tuple(TINY_VARS),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200},
        sigma_data=1.0,
    )

    def f(xj):
        return ours(
            params, jax.random.PRNGKey(0), xj,
            condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux),
        )

    val, gx = jax.value_and_grad(f)(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-4)
    gx = np.transpose(np.asarray(gx), (0, 3, 1, 2))
    scale = max(np.abs(ref_gx.numpy()).max(), 1e-8)
    np.testing.assert_allclose(gx, ref_gx.numpy(), rtol=1e-3, atol=2e-4 * scale)


@pytest.mark.parametrize("mode", ["warmup", "full", "distill"])
def test_scm_loss_value_and_grad_parity(monkeypatch, mode):
    """sCM loss — the subtlest math in the project: JVP-rearranged g, tangent
    normalization with spatial-norm invariance, adaptive logvar, tangent
    warmup ramp, distillation teacher (loss.py:163-260). Grad-wrt-x parity
    additionally proves the detach placements (F̂/dF̂ detached; x_t, dxt_dt
    live) match the reference exactly."""
    ref_net, precond, params, x, cond, aux, tau = _trigflow_pair(monkeypatch, seed=9)

    warmup = 2 if mode == "warmup" else 0
    step = 700  # with warmup=2 kimg -> r = 0.35
    distill = mode == "distill"

    teacher_ref = teacher_ours = None
    if distill:
        torch.manual_seed(3)
        teacher_net = _build_reference(TINY)
        teacher_params = _convert(teacher_net, TINY, scan_layers=True)
        teacher_precond = _build_ours(TINY, scan_layers=True)
        teacher_ref = teacher_net
        teacher_ours = Network(teacher_precond, teacher_params)

    ref_loss = ref_loss_mod.SCMLoss(
        dataset=_fake_dataset(TINY),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200},
        sigma_data=1.0,
        tangent_warmup_kimg=warmup,
        distillation=distill,
    )
    ref_loss._sampling_fn = lambda x: torch.from_numpy(tau)

    x_t = torch.from_numpy(x).requires_grad_(True)
    ref_val = ref_loss(
        _DDPShim(ref_net), x_t, step=step,
        condition=torch.from_numpy(cond), auxiliary=torch.from_numpy(aux),
        net_pretrained=teacher_ref,
    )
    (ref_gx,) = torch.autograd.grad(ref_val, x_t)

    ours = loss_mod.SCMLoss(
        precond=precond, lat_dim=TINY["img_resolution"][0], variables=tuple(TINY_VARS),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200},
        sigma_data=1.0, tangent_warmup_kimg=warmup, distillation=distill,
    )

    def f(xj):
        return ours(
            params, jax.random.PRNGKey(0), xj, step=jnp.float32(step),
            condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux),
            teacher=teacher_ours,
        )

    val, gx = jax.value_and_grad(f)(jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(float(val), float(ref_val), rtol=5e-4)
    gx = np.transpose(np.asarray(gx), (0, 3, 1, 2))
    scale = max(np.abs(ref_gx.numpy()).max(), 1e-8)
    np.testing.assert_allclose(gx, ref_gx.numpy(), rtol=2e-3, atol=5e-4 * scale)


# ----------------------------------------------------------------------------
# Muon optimizer trajectory


def test_newton_schulz_matches_reference():
    """Quintic NS in bf16 vs zeropower_via_newtonschulz5 (muon.py:5-35), both
    orientations (tall input triggers the transpose branch)."""
    rng = np.random.default_rng(11)
    for shape in [(16, 32), (48, 16)]:
        g = rng.standard_normal(shape).astype(np.float32)
        ref = ref_muon_mod.zeropower_via_newtonschulz5(torch.from_numpy(g), steps=5)
        ours = newton_schulz(jnp.asarray(g), steps=5)
        # both run in bfloat16; rounding differences compound over 15 matmuls
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), ref.float().numpy(), atol=0.05
        )
        # and the result must be near-orthogonal in fp32 terms
        o = np.asarray(ours, np.float32)
        if shape[0] > shape[1]:
            o = o.T
        s = np.linalg.svd(o, compute_uv=False)
        assert 0.3 < s.min() and s.max() < 1.8


def test_muon_aux_adam_trajectory_matches_reference():
    """5 coupled Muon+Adam updates track SingleDeviceMuonWithAuxAdam
    (muon.py:267-338): momentum blend, NS orthogonalization, aspect-ratio
    rescale, decoupled weight decay, and the hand-rolled bias-corrected Adam
    with eps-after-correction (muon.py:149-154)."""
    rng = np.random.default_rng(12)
    w1 = rng.standard_normal((16, 32)).astype(np.float32)
    w2 = rng.standard_normal((48, 16)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    grads = [
        {
            "w1": rng.standard_normal((16, 32)).astype(np.float32),
            "w2": rng.standard_normal((48, 16)).astype(np.float32),
            "b": rng.standard_normal((32,)).astype(np.float32),
        }
        for _ in range(5)
    ]

    MU_LR, MU_WD, MOM = 0.05, 0.01, 0.95
    AD_LR, AD_BETAS, AD_EPS, AD_WD = 3e-4, (0.9, 0.95), 1e-10, 0.004

    tp = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in
          [("w1", w1), ("w2", w2), ("b", b)]}
    ref_opt = ref_muon_mod.SingleDeviceMuonWithAuxAdam([
        dict(params=[tp["w1"], tp["w2"]], use_muon=True,
             lr=MU_LR, momentum=MOM, weight_decay=MU_WD),
        dict(params=[tp["b"]], use_muon=False,
             lr=AD_LR, betas=AD_BETAS, eps=AD_EPS, weight_decay=AD_WD),
    ])

    jp = {"w1": jnp.asarray(w1), "w2": jnp.asarray(w2), "b": jnp.asarray(b)}
    tx = muon_with_aux_adam(
        param_labels=lambda p: {"w1": "muon", "w2": "muon", "b": "adam"},
        lr=MU_LR, weight_decay=MU_WD, momentum=MOM,
        adam_lr=AD_LR, adam_betas=AD_BETAS, adam_weight_decay=AD_WD,
        adam_eps=AD_EPS,
    )
    state = tx.init(jp)

    import optax

    for step in range(5):
        for k in tp:
            tp[k].grad = torch.from_numpy(grads[step][k].copy())
        ref_opt.step()

        g = {k: jnp.asarray(v) for k, v in grads[step].items()}
        updates, state = tx.update(g, state, jp)
        jp = optax.apply_updates(jp, updates)

        for k in ["w1", "w2", "b"]:
            # NS runs in bf16 on both sides with independent rounding; the
            # per-step update discrepancy (~lr * bf16-eps * NS gain) compounds
            # linearly in the params. Adam runs fp32 -> near-exact.
            atol = 5e-3 * (step + 1) if k != "b" else 1e-6
            np.testing.assert_allclose(
                np.asarray(jp[k]), tp[k].detach().numpy(), atol=atol,
                err_msg=f"step {step} param {k}",
            )


# ----------------------------------------------------------------------------
# Solver golden parity (the four that only had analytic tests)


@pytest.fixture(scope="module")
def solver_nets():
    """One shared tiny PassPrecond net pair for the TrigFlow-time solvers."""
    ref_net = _build_reference(TINY)
    precond = _build_ours(TINY, scan_layers=True)
    params = _convert(ref_net, TINY, scan_layers=True)
    return ref_net, Network(precond, params)


@pytest.fixture(scope="module")
def solver_latents():
    x, cond, _, aux = _inputs(TINY, seed=13)
    H, W = TINY["img_resolution"]
    latents = np.random.default_rng(14).standard_normal(
        (x.shape[0], TINY["img_channels"], H, W)
    ).astype(np.float32)
    return latents, cond, aux


def _zero_jax_noise(monkeypatch):
    monkeypatch.setattr(
        jax.random,
        "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )


@pytest.mark.parametrize("s_churn", [0.0, 0.4])
def test_edm_sampler_parity(monkeypatch, solver_nets, solver_latents, s_churn):
    """EDM Heun sampler incl. the S_churn re-noising path (diffusion.py:10-92);
    stochastic draws zeroed on both sides so trajectories are comparable."""
    ref_net, net = solver_nets
    latents, cond, aux = solver_latents
    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    kw = dict(num_steps=4, sigma_min=0.02, sigma_max=10.0, S_churn=s_churn)
    with torch.no_grad():
        ref_y = ref_sampler.edm_sampler(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond), auxiliary=torch.from_numpy(aux),
            randn_like=torch.zeros_like, denoise_dtype=torch.float32, **kw,
        ).numpy()

    _zero_jax_noise(monkeypatch)
    ours = our_solvers.edm_sampler(
        net, jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux), **kw,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-3, atol=5e-4 * scale)


@pytest.mark.parametrize(
    "combo",
    [
        dict(discretization="vp", schedule="vp", scaling="vp", solver="heun"),
        dict(discretization="ve", schedule="ve", scaling="none", solver="heun"),
        dict(discretization="iddpm", schedule="linear", scaling="none", solver="euler"),
        dict(discretization="edm", schedule="linear", scaling="none", solver="heun",
             S_churn=0.3),
    ],
    ids=["vp", "ve", "iddpm", "edm-churn"],
)
def test_ablation_sampler_parity(monkeypatch, solver_nets, solver_latents, combo):
    """Generalized VP/VE/iDDPM/EDM sampler (diffusion.py:94-287). The
    reference runs in float64 under an autocast that CPU can't enter, so it
    is run with autocast stubbed out and a float64 net; ours runs its normal
    fp32 path."""
    ref_net, net = solver_nets
    latents, cond, aux = solver_latents
    ref64 = _build_reference(TINY).double()
    ref64.load_state_dict(ref_net.state_dict())
    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref64)
    kw = dict(num_steps=4, **combo)
    monkeypatch.setattr(
        torch, "autocast", lambda *a, **k: contextlib.nullcontext()
    )
    with torch.no_grad():
        ref_y = ref_sampler.ablation_sampler(
            torch.from_numpy(latents).double(),
            condition=torch.from_numpy(cond).double(),
            auxiliary=torch.from_numpy(aux).double(),
            randn_like=torch.zeros_like, **kw,
        ).numpy()

    _zero_jax_noise(monkeypatch)
    ours = our_solvers.ablation_sampler(
        net, jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux), **kw,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=2e-3, atol=1e-3 * scale)


@pytest.mark.parametrize("use_pp", [True, False])
def test_dpm_solver_parity(solver_nets, solver_latents, use_pp):
    """DPM-Solver(++) 2M on TrigFlow time — the online-validation solver of
    record (trainer solver_type='dpm'; diffusion.py:289-353). Deterministic,
    so no noise pinning needed."""
    ref_net, net = solver_nets
    latents, cond, aux = solver_latents
    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    kw = dict(num_steps=5, sigma_min=0.02, sigma_max=20.0, use_pp=use_pp)
    with torch.no_grad():
        ref_y = ref_sampler.dpm_solver(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond), auxiliary=torch.from_numpy(aux),
            denoise_dtype=torch.float32, **kw,
        ).numpy()

    ours = our_solvers.dpm_solver(
        net, jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux), **kw,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-3, atol=5e-4 * scale)


def test_dpm_solver_2s_parity(solver_nets, solver_latents):
    """DPM-Solver++ 2S per-step Heun on v-prediction (diffusion.py:355-415)."""
    ref_net, net = solver_nets
    latents, cond, aux = solver_latents
    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    kw = dict(num_steps=3, sigma_min=0.02, sigma_max=20.0)
    with torch.no_grad():
        ref_y = ref_sampler.dpm_solver_2s(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond), auxiliary=torch.from_numpy(aux),
            denoise_dtype=torch.float32, **kw,
        ).numpy()

    ours = our_solvers.dpm_solver_2s(
        net, jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux), **kw,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-3, atol=5e-4 * scale)


def test_scm_solve2_parity(monkeypatch, solver_nets, solver_latents):
    """scm_solve2 variant ordering — noise injected AFTER the step
    (diffusion.py:463-512); intermediate noise zeroed on both sides."""
    ref_net, net = solver_nets
    latents, cond, aux = solver_latents
    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    kw = dict(num_steps=2, sigma_min=0.02, sigma_max=20.0)
    with torch.no_grad():
        ref_y = ref_sampler.scm_solve2(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond), auxiliary=torch.from_numpy(aux),
            randn_like=torch.zeros_like, denoise_dtype=torch.float32, **kw,
        ).numpy()

    _zero_jax_noise(monkeypatch)
    ours = our_solvers.scm_solve2(
        net, jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)), auxiliary=jnp.asarray(aux), **kw,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-3, atol=5e-4 * scale)


# ----------------------------------------------------------------------------
# Multistep finetune losses (MSE, almost-fair kernel CRPS) — the last
# training-side math without a golden proof. Both unroll an autoregressive
# un/re-standardize cycle through the net (reference loss.py:266-445); the
# draws are pinned as an ordered SEQUENCE (one x_t per unroll step per
# member) consumed identically on both sides.


def _pin_sequence(monkeypatch, z_list_nchw):
    """Pin torch.randn_like and jax.random.normal to pop the same ordered
    sequence of draws (matched by the loss's full-batch NHWC shape)."""
    it_t = iter([torch.from_numpy(z) for z in z_list_nchw])
    monkeypatch.setattr(torch, "randn_like", lambda x: next(it_t).clone())

    seq_j = [jnp.asarray(_nhwc(z)) for z in z_list_nchw]
    it_j = iter(seq_j)
    shape0 = seq_j[0].shape
    real_normal = jax.random.normal

    def pinned(key, shape=(), dtype=jnp.float32):
        if tuple(shape) == shape0:
            return next(it_j).astype(dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", pinned)


class _StdDataset:
    """Duck-typed reference-dataset stand-in with REAL standardization math
    (the reference losses read _shape/variables and call the standardize
    API, era5.py:110-170; stats channel count resolves variables vs
    forcings like the pseudo-dynamic slicing there)."""

    def __init__(self, mean, std, dstd, shape, fmean=None, fstd=None,
                 forc_table=None):
        self._shape = shape  # (C, H, W)
        self.variables = TINY_VARS
        self._mean, self._std, self._dstd = mean, std, dstd
        self._fmean, self._fstd = fmean, fstd
        self._forc = forc_table

    def _xstats(self, c):
        nv = len(self.variables)
        if c == nv:
            return self._mean, self._std
        if self._fmean is not None and c == len(self._fmean):
            return self._fmean, self._fstd
        assert self._fmean is not None and c == nv + len(self._fmean)
        return (np.concatenate([self._mean, self._fmean]),
                np.concatenate([self._std, self._fstd]))

    @staticmethod
    def _bc(a):
        return torch.from_numpy(a)[None, :, None, None]

    def standardize_x(self, x, delta=6):
        m, s = self._xstats(x.shape[1])
        return (x - self._bc(m)) / self._bc(s)

    def unstandardize_x(self, x, delta=6):
        m, s = self._xstats(x.shape[1])
        return x * self._bc(s) + self._bc(m)

    def unstandardize_t(self, y, delta=6):
        return y * self._bc(self._dstd)

    def get_forcings(self, idx):
        return torch.from_numpy(self._forc[idx])


def _multistep_stats(rng, C):
    mean = rng.standard_normal(C).astype(np.float32)
    std = (0.5 + rng.uniform(0.5, 1.5, C)).astype(np.float32)
    dstd = (0.1 + rng.uniform(0.1, 1.0, C)).astype(np.float32)
    mean_j, std_j, dstd_j = map(jnp.asarray, (mean, std, dstd))
    std_fns = (
        lambda v, delta=6: v * dstd_j,
        lambda v, delta=6: v * std_j + mean_j,
        lambda v, delta=6: (v - mean_j) / std_j,
    )
    return mean, std, dstd, std_fns


@pytest.mark.parametrize("steps", [1, 3])
def test_mse_multistep_loss_parity(monkeypatch, steps):
    """Multistep MSE loss value + d(loss)/d(condition) vs the reference
    MSELoss (loss.py:266-303): the t=π/2 one-shot prediction and the
    autoregressive un/re-standardize residual condition update. The
    reference's un-sliced residual add only type-checks without forcings,
    so condition_channels == img_channels here."""
    cfg = dict(TINY, condition_channels=3)
    ref_net = _build_reference(cfg)
    precond = _build_ours(cfg, scan_layers=True)
    params = _convert(ref_net, cfg, scan_layers=True)

    H, W = cfg["img_resolution"]
    B, C = 2, cfg["img_channels"]
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    cond = rng.standard_normal((B, C, H, W)).astype(np.float32)
    aux = np.full((B, 1), 0.6, np.float32)
    zs = [rng.standard_normal((B, C, H, W)).astype(np.float32)
          for _ in range(steps)]
    _pin_sequence(monkeypatch, zs)
    mean, std, dstd, std_fns = _multistep_stats(rng, C)

    ref_loss = ref_loss_mod.MSELoss(
        dataset=_StdDataset(mean, std, dstd, shape=(C, H, W)), sigma_data=1.0
    )
    cond_t = torch.from_numpy(cond).requires_grad_(True)
    ref_val = ref_loss(
        ref_net, torch.from_numpy(x), condition=cond_t,
        auxiliary=torch.from_numpy(aux), steps=steps,
    )
    (ref_gc,) = torch.autograd.grad(ref_val, cond_t)

    ours = loss_mod.MSELoss(
        precond=precond, lat_dim=H, variables=tuple(TINY_VARS),
        sigma_data=1.0, std_fns=std_fns, n_variables=C,
    )

    def f(cj):
        return ours(
            params, jax.random.PRNGKey(0), jnp.asarray(_nhwc(x)),
            condition=cj, auxiliary=jnp.asarray(aux), steps=steps,
        )

    val, gc = jax.value_and_grad(f)(jnp.asarray(_nhwc(cond)))
    np.testing.assert_allclose(float(val), float(ref_val.detach()), rtol=3e-4)
    gc = np.transpose(np.asarray(gc), (0, 3, 1, 2))
    scale = max(np.abs(ref_gc.numpy()).max(), 1e-8)
    np.testing.assert_allclose(gc, ref_gc.numpy(), rtol=1e-3, atol=3e-4 * scale)


@pytest.mark.parametrize("steps,check_grad", [(1, True), (2, False)])
def test_crps_multistep_loss_parity(monkeypatch, steps, check_grad):
    """Multistep almost-fair kernel CRPS vs the reference CRPSLoss
    (loss.py:306-445): 2-member ensemble, per-step forcing injection
    (pre-staged on our side vs in-loss h5 reads), v-prediction residual
    update, kernel CRPS. Gradient parity at steps=1 (at steps>1 the
    reference's re-entrant checkpoint re-draws its noise during backward,
    making its own forward/backward inconsistent under pinned draws —
    value-only there)."""
    cfg = TINY  # 3 variables + 1 forcing channel
    nF = cfg["condition_channels"] - cfg["img_channels"]
    ref_net = _build_reference(cfg)
    precond = _build_ours(cfg, scan_layers=True)
    params = _convert(ref_net, cfg, scan_layers=True)

    H, W = cfg["img_resolution"]
    B, C = 2, cfg["img_channels"]
    m = 2  # ensemble_size
    rng = np.random.default_rng(12)
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    cond = rng.standard_normal((B, C + nF, H, W)).astype(np.float32)
    aux = np.full((B, 1), 0.6, np.float32)
    idx = [0, 3]
    zs = [rng.standard_normal((B, C, H, W)).astype(np.float32)
          for _ in range(m * steps)]
    _pin_sequence(monkeypatch, zs)
    mean, std, dstd, std_fns = _multistep_stats(rng, C)
    fmean = rng.standard_normal(nF).astype(np.float32)
    fstd = (0.5 + rng.uniform(0.5, 1.5, nF)).astype(np.float32)
    forc_table = rng.standard_normal((max(idx) + steps, nF, H, W)).astype(
        np.float32
    )

    ref_loss = ref_loss_mod.CRPSLoss(
        dataset=_StdDataset(mean, std, dstd, shape=(C, H, W), fmean=fmean,
                            fstd=fstd, forc_table=forc_table),
        sigma_data=1.0, ensemble_size=m,
    )
    cond_t = torch.from_numpy(cond).requires_grad_(True)
    ref_val = ref_loss(
        ref_net, torch.from_numpy(x), condition=cond_t,
        auxiliary=torch.from_numpy(aux), idx=idx, steps=steps,
    )
    if check_grad:
        (ref_gc,) = torch.autograd.grad(ref_val, cond_t)

    # pre-staged standardized forcings: step i of initial condition b reads
    # forcing index idx[b] + i (reference loss.py:380-395 with Δ=6h)
    forcings_seq = np.stack(
        [
            [
                np.transpose((forc_table[j + i] - fmean[:, None, None])
                             / fstd[:, None, None], (1, 2, 0))
                for i in range(steps)
            ]
            for j in idx
        ]
    ).astype(np.float32)  # (B, steps, H, W, F)

    ours = loss_mod.CRPSLoss(
        precond=precond, lat_dim=H, variables=tuple(TINY_VARS),
        sigma_data=1.0, ensemble_size=m, std_fns=std_fns, n_variables=C,
    )

    def f(cj):
        return ours(
            params, jax.random.PRNGKey(0), jnp.asarray(_nhwc(x)), cj,
            jnp.asarray(aux), jnp.asarray(forcings_seq), delta=6,
            steps=steps,
        )

    if check_grad:
        val, gc = jax.value_and_grad(f)(jnp.asarray(_nhwc(cond)))
        gc = np.transpose(np.asarray(gc), (0, 3, 1, 2))
        scale = max(np.abs(ref_gc.numpy()).max(), 1e-8)
        np.testing.assert_allclose(gc, ref_gc.numpy(), rtol=1e-3,
                                   atol=3e-4 * scale)
    else:
        val = f(jnp.asarray(_nhwc(cond)))
    np.testing.assert_allclose(float(val), float(ref_val.detach()), rtol=3e-4)
