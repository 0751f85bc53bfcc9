"""Golden parity for the ACCURACY REFEREES against the reference's own code.

The eval metrics (`swift_tpu/eval/metrics.py`) and the online-validation
rollout (`swift_tpu/training/validate.py::RMSE_rollout`) are the functions
that will certify the north-star "RMSE/CRPS parity" claim — until this file
they were the last math surface tested only analytically (round-3 VERDICT
missing #2). Here they are tested value-for-value against the reference's
own implementations:

  (a) ``lat_weighted_rmse`` / ``lat_weighted_crps`` /
      ``lat_weighted_spread_skill_ratio`` vs
      /root/reference/src/swift/eval/metrics.py:39-134 on shared random
      ensembles (ensemble and deterministic shapes);
  (b) ``RMSE_rollout`` vs /root/reference/src/swift/training/validate.py:23-127
      end to end: the reference's OWN ``ERA5RollOutDataset`` and
      ``sampler_factory`` run on a shared synthetic ERA5 root against our
      dataset/factory/rollout, with a tiny converted SwinV2 (weights from the
      reference state_dict) and the latent draws pinned to zero on both
      sides so the 8-step autoregressive trajectories are comparable.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_import import import_reference
from tests.test_reference_parity import TINY, _build_ours, _build_reference, _convert

swift_ref = import_reference()
ref_metrics = importlib.import_module("swift.eval.metrics")
ref_validate = importlib.import_module("swift.training.validate")
ref_factory = importlib.import_module("swift.generating.factory")
ref_era5 = importlib.import_module("swift.data.era5")

from swift_tpu.data.era5 import ERA5RollOutDataset
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.eval import metrics as our_metrics
from swift_tpu.sampling.factory import param_sampler_factory
from swift_tpu.training.validate import RMSE_rollout

# ---------------------------------------------------------------------------
# (a) metric functions on shared random ensembles


def _ensemble(seed=0, B=3, N=5, V=2, H=16, W=32):
    rng = np.random.default_rng(seed)
    pred = rng.standard_normal((B, N, V, H, W)).astype(np.float32)
    # offset so skill/spread are O(1) and distinct per variable
    pred += np.arange(V, dtype=np.float32).reshape(1, 1, V, 1, 1)
    y = rng.standard_normal((B, V, H, W)).astype(np.float32)
    lat = np.linspace(-88.6, 88.6, H)  # float64, as xr ds.latitude.values
    return pred, y, lat


VARS2 = ["geopotential_500", "2m_temperature"]


def test_lat_weighted_rmse_matches_reference():
    pred, y, lat = _ensemble()
    ref = ref_metrics.lat_weighted_rmse(
        torch.from_numpy(pred), torch.from_numpy(y), VARS2, lat, "6h"
    )
    for i, var in enumerate(VARS2):
        ours = our_metrics.lat_weighted_rmse(pred[:, :, i], y[:, i], lat)
        np.testing.assert_allclose(
            ours, ref[f"rmse_{var}_6h"].item(), rtol=2e-5, atol=1e-6
        )


def test_lat_weighted_rmse_deterministic_matches_reference():
    """The no-ensemble shape (B, V, H, W) vs our (B, H, W)."""
    pred, y, lat = _ensemble(seed=1)
    det = pred[:, 0]  # (B, V, H, W)
    ref = ref_metrics.lat_weighted_rmse(
        torch.from_numpy(det), torch.from_numpy(y), VARS2, lat, "6h"
    )
    for i, var in enumerate(VARS2):
        ours = our_metrics.lat_weighted_rmse(det[:, i], y[:, i], lat)
        np.testing.assert_allclose(
            ours, ref[f"rmse_{var}_6h"].item(), rtol=2e-5, atol=1e-6
        )


def test_lat_weighted_crps_matches_reference():
    pred, y, lat = _ensemble(seed=2)
    ref = ref_metrics.lat_weighted_crps(
        torch.from_numpy(pred), torch.from_numpy(y), VARS2, lat, "24h"
    )
    for i, var in enumerate(VARS2):
        ours = our_metrics.lat_weighted_crps(pred[:, :, i], y[:, i], lat)
        np.testing.assert_allclose(
            ours, ref[f"crps_{var}_24h"].item(), rtol=2e-5, atol=1e-6
        )


def test_lat_weighted_ssr_matches_reference():
    pred, y, lat = _ensemble(seed=3)
    ref = ref_metrics.lat_weighted_spread_skill_ratio(
        torch.from_numpy(pred), torch.from_numpy(y), VARS2, lat, "48h"
    )
    for i, var in enumerate(VARS2):
        ours = our_metrics.lat_weighted_spread_skill_ratio(
            pred[:, :, i], y[:, i], lat
        )
        np.testing.assert_allclose(
            ours, ref[f"ssr_{var}_48h"].item(), rtol=5e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# (b) online-validation rollout end to end

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]
H, W = TINY["img_resolution"]
INTERVAL = 8  # 2 days of 6h steps -> arr columns [6h, day1, day2]


# residual=True only: the reference's own non-residual path crashes inside
# ERA5Dataset.unstandardize_t (era5.py:165-170 — t_means is the (C+F,1,1)
# x_means array there, and t_means[delta] indexes it with delta=6), so
# RMSE_rollout is residual-only in the reference too; every reference
# experiment config sets data.dataset.residual: true.
@pytest.mark.parametrize("residual", [True])
def test_rmse_rollout_matches_reference(tmp_path, monkeypatch, residual):
    root = make_synthetic_era5(
        str(tmp_path / "data"), VARS, FORCINGS,
        n_train=2, n_val=2, n_test=16, shape=(H, W),
    )

    # one reference net, converted weights for ours (forward parity is
    # covered in test_reference_parity; here the rollout math is under test)
    ref_net = _build_reference(TINY)
    precond = _build_ours(TINY, scan_layers=True)
    params = _convert(ref_net, TINY, scan_layers=True)

    solver_kwargs = dict(num_steps=1, sigma_min=0.02, sigma_max=200.0,
                         auxiliary=0.6)
    ref_sampler = ref_factory.sampler_factory("scm", ref_net, **solver_kwargs)
    our_sampler = param_sampler_factory("scm", precond, **solver_kwargs)

    # pin the latent draws to zero on BOTH sides: the samplers draw latents
    # internally (torch.randn / jax.random.normal), and the two RNG streams
    # can never match.
    monkeypatch.setattr(
        torch, "randn",
        lambda size, generator=None, device=None, dtype=None: torch.zeros(
            size, device=device
        ),
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )

    ref_ds = ref_era5.ERA5RollOutDataset(
        interval=INTERVAL, root=root, variables=VARS, forcings=FORCINGS,
        residual=residual, split="test",
    )
    dl = torch.utils.data.DataLoader(ref_ds, batch_size=2, shuffle=False)
    with torch.no_grad():
        agg_ref, arr_ref = ref_validate.RMSE_rollout(
            ref_sampler, iter(dl), ref_ds, INTERVAL,
            torch.device("cpu"), num_batches=2,
        )

    our_ds = ERA5RollOutDataset(
        interval=INTERVAL, root=root, variables=VARS, forcings=FORCINGS,
        residual=residual, split="test",
    )

    def batches():
        for b0 in range(0, 4, 2):
            items = [our_ds[i] for i in range(b0, b0 + 2)]
            yield (
                np.stack([it[0] for it in items]),
                np.stack([it[1] for it in items]),
                np.asarray([it[2] for it in items]),
            )

    agg, arr = RMSE_rollout(
        our_sampler, params, batches(), our_ds, INTERVAL,
        jax.random.PRNGKey(0), num_batches=2,
    )

    np.testing.assert_allclose(agg, float(agg_ref), rtol=1e-3, atol=1e-4)
    assert arr.shape == arr_ref.shape == (len(VARS), INTERVAL // 4 + 1)
    np.testing.assert_allclose(arr, arr_ref, rtol=1e-3, atol=1e-4)
