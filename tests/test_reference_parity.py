"""Golden parity against the ACTUAL reference implementation.

Instantiates the reference's own ``swift.models.precond.PassPrecond`` +
``swift.models.swinv2.SwinV2`` (imported from /root/reference/src — torch is
installed), converts its state_dict through our converter, and demands:

  (a) forward agreement in fp32 (tiny config AND a flagship-shaped one),
  (b) 1-step ``scm_solver`` forecast agreement vs the reference
      ``swift.generating.diffusion.DiffusionSampler.scm_solver``
      (reference: src/swift/generating/diffusion.py:417-461),

in both the scan-over-layers and unrolled parameter layouts. This backs the
BASELINE.md "forecasts bit-comparable at init" claim with the reference's
own code rather than a transcription (round-1 VERDICT item #1).

The reference zero-inits modulation/head weights (swinv2.py:295-303), which
would make forward parity trivially 0 == 0 — so every all-zero weight is
refilled with small gaussian noise before comparison.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_import import import_reference

from swift_tpu.models.convert import swinv2_state_dict_to_params
from swift_tpu.models.precond import Network, PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.sampling.solvers import scm_solver

swift_ref = import_reference()

TINY = dict(
    img_resolution=(8, 16), img_channels=3, condition_channels=4,
    window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
    depth=2, dim=32, heads=4, auxiliary_dim=1, logvar=True,
)
# Flagship structure (experiment/era5-swinv2-1.4-scm.yaml:22-28): dim 1056 /
# 12 heads (head_dim 88), depth 12, window 16x16, shift 8x8, patch 2x2,
# 69 vars + 72 condition channels. Spatial size reduced 128x256 -> 32x64 to
# keep the CPU fp32 forward tractable; every structural dimension that could
# hide a transcription bug (per-head qkv chunking, non-square windows vs
# grid, shift wrap, channel counts) is preserved.
FLAGSHIP_SHAPED = dict(
    img_resolution=(32, 64), img_channels=69, condition_channels=72,
    window_size=(16, 16), shift_size=(8, 8), patch_size=(2, 2),
    depth=12, dim=1056, heads=12, auxiliary_dim=1, logvar=True,
)


def _build_reference(cfg):
    """Reference PassPrecond(SwinV2) with randomized zero-init weights."""
    torch.manual_seed(0)
    net = swift_ref.models.precond.PassPrecond(
        model_config={
            "_target_": "swift.models.swinv2.SwinV2",
            "window_size": list(cfg["window_size"]),
            "shift_size": list(cfg["shift_size"]),
            "patch_size": list(cfg["patch_size"]),
            "depth": cfg["depth"],
            "dim": cfg["dim"],
            "heads": cfg["heads"],
            "logvar": cfg["logvar"],
        },
        img_resolution=list(cfg["img_resolution"]),
        img_channels=cfg["img_channels"],
        condition_channels=cfg["condition_channels"],
        auxiliary_dim=cfg["auxiliary_dim"],
        sigma_data=1.0,
    )
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in net.parameters():
            if p.count_nonzero() == 0:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))
    return net.eval()


def _build_ours(cfg, scan_layers):
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
        logvar=cfg["logvar"],
        dtype=jnp.float32,
        use_pallas=False,
        scan_layers=scan_layers,
    )
    return PassPrecond(
        model=model,
        img_resolution=tuple(cfg["img_resolution"]),
        img_channels=cfg["img_channels"],
        condition_channels=cfg["condition_channels"],
        auxiliary_dim=cfg["auxiliary_dim"],
        sigma_data=1.0,
    )


def _convert(ref_net, cfg, scan_layers):
    return swinv2_state_dict_to_params(
        ref_net.state_dict(), cfg["depth"], scan_layers=scan_layers
    )


def _inputs(cfg, seed=2):
    rng = np.random.default_rng(seed)
    H, W = cfg["img_resolution"]
    B = 2 if cfg is TINY else 1  # bound the CPU cost of the flagship shape
    x = rng.standard_normal((B, cfg["img_channels"], H, W)).astype(np.float32)
    cond = rng.standard_normal(
        (B, cfg["condition_channels"], H, W)
    ).astype(np.float32)
    t = np.full((B,), 1.1, np.float32)
    aux = np.full((B, cfg["auxiliary_dim"]), 0.6, np.float32)
    return x, cond, t, aux


def _nhwc(a):
    return np.ascontiguousarray(np.transpose(a, (0, 2, 3, 1)))


@pytest.mark.parametrize("cfg_name", ["tiny", "flagship_shaped"])
@pytest.mark.parametrize("scan_layers", [True, False])
def test_forward_parity_vs_reference(cfg_name, scan_layers):
    cfg = TINY if cfg_name == "tiny" else FLAGSHIP_SHAPED
    if cfg_name == "flagship_shaped" and not scan_layers:
        pytest.skip("flagship unrolled layout covered by the tiny config")
    ref_net = _build_reference(cfg)
    precond = _build_ours(cfg, scan_layers)
    params = _convert(ref_net, cfg, scan_layers)
    x, cond, t, aux = _inputs(cfg)

    with torch.no_grad():
        ref_out, ref_logvar = ref_net(
            torch.from_numpy(x),
            torch.from_numpy(t),
            condition=torch.from_numpy(cond),
            auxiliary=torch.from_numpy(aux),
            return_logvar=True,
        )
    ref_out = ref_out.numpy()

    ours, logvar = precond.apply(
        params,
        jnp.asarray(_nhwc(x)),
        jnp.asarray(t),
        condition=jnp.asarray(_nhwc(cond)),
        auxiliary=jnp.asarray(aux),
        return_logvar=True,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    scale = max(np.abs(ref_out).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(logvar), ref_logvar.numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("cfg_name", ["tiny", "flagship_shaped"])
def test_scm_forecast_parity_vs_reference(cfg_name):
    """1-step sCM forecast (the inference config of record,
    generate.py:255-261) agrees with the reference solver net-for-net."""
    cfg = TINY if cfg_name == "tiny" else FLAGSHIP_SHAPED
    ref_net = _build_reference(cfg)
    precond = _build_ours(cfg, scan_layers=True)
    params = _convert(ref_net, cfg, scan_layers=True)
    x, cond, t, aux = _inputs(cfg, seed=3)

    H, W = cfg["img_resolution"]
    latents = np.random.default_rng(4).standard_normal(
        (x.shape[0], cfg["img_channels"], H, W)
    ).astype(np.float32)

    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    with torch.no_grad():
        ref_y = ref_sampler.scm_solver(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond),
            auxiliary=torch.from_numpy(aux),
            num_steps=1,
            sigma_min=0.02,
            sigma_max=200.0,
        ).numpy()

    ours = scm_solver(
        Network(precond, params),
        jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)),
        auxiliary=jnp.asarray(aux),
        num_steps=1,
        sigma_min=0.02,
        sigma_max=200.0,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-4, atol=2e-4 * scale)


def test_two_step_scm_schedule_matches_reference(monkeypatch):
    """The 2-step special case (t1 = 1.1, diffusion.py:446-447): drive both
    solvers with zero intermediate noise so trajectories are comparable."""
    cfg = TINY
    ref_net = _build_reference(cfg)
    precond = _build_ours(cfg, scan_layers=True)
    params = _convert(ref_net, cfg, scan_layers=True)
    x, cond, t, aux = _inputs(cfg, seed=5)
    H, W = cfg["img_resolution"]
    latents = np.random.default_rng(6).standard_normal(
        (x.shape[0], cfg["img_channels"], H, W)
    ).astype(np.float32)

    ref_sampler = swift_ref.generating.diffusion.DiffusionSampler(ref_net)
    with torch.no_grad():
        ref_y = ref_sampler.scm_solver(
            torch.from_numpy(latents),
            condition=torch.from_numpy(cond),
            auxiliary=torch.from_numpy(aux),
            randn_like=torch.zeros_like,
            num_steps=2,
            sigma_min=0.02,
            sigma_max=200.0,
        ).numpy()

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    ours = scm_solver(
        Network(precond, params),
        jnp.asarray(_nhwc(latents)),
        condition=jnp.asarray(_nhwc(cond)),
        auxiliary=jnp.asarray(aux),
        key=jax.random.PRNGKey(0),
        num_steps=2,
        sigma_min=0.02,
        sigma_max=200.0,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    scale = max(np.abs(ref_y).max(), 1e-6)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-4, atol=2e-4 * scale)
