"""Rollout + validation + ensemble engine + eval metric tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_tpu.data.era5 import ERA5Dataset, ERA5RollOutDataset
from swift_tpu.data.standardize import Standardizer
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.eval.metrics import (
    lat_weighted_crps,
    lat_weighted_rmse,
    lat_weighted_spread_skill_ratio,
)
from swift_tpu.sampling.ensemble import EnsembleRollout
from swift_tpu.sampling.rollout import forecast_rollout
from swift_tpu.training.validate import RMSE_rollout

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]
H, W = 8, 16


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("era5roll")
    make_synthetic_era5(str(root), VARS, FORCINGS, n_train=16, n_val=16,
                        n_test=16, shape=(H, W))
    return ERA5Dataset(root=str(root), variables=VARS, forcings=FORCINGS,
                       residual=True, split="test")


def zero_sampler(params, cond, key, auxiliary=None):
    """Predicts zero residual: the state should stay fixed in physical space."""
    return jnp.zeros(cond.shape[:-1] + (len(VARS),))


def test_forecast_rollout_identity_with_zero_residual(ds):
    std = Standardizer.from_dataset(ds)
    X0 = jnp.asarray(
        np.stack([np.asarray(ds.standardize_x(ds._load_file(ds.files[i], VARS)))
                  for i in range(2)])
    )
    forc = jnp.zeros((2, 5, H, W, len(FORCINGS)))
    traj = forecast_rollout(
        zero_sampler, None, std, X0, forc, jax.random.PRNGKey(0), steps=5
    )
    assert traj.shape == (2, 6, H, W, len(VARS))
    # zero residual => every lead equals the initial physical state
    for k in range(1, 6):
        np.testing.assert_allclose(
            np.asarray(traj[:, k]), np.asarray(traj[:, 0]), rtol=1e-5, atol=1e-5
        )


def test_rmse_rollout_perfect_persistence(ds, tmp_path_factory):
    """With a zero-residual sampler and persistence targets, RMSE should be
    exactly the persistence error vs the real evolution (> 0, finite)."""
    roll = ERA5RollOutDataset(
        interval=8, root=ds.root, variables=VARS, forcings=FORCINGS,
        residual=True, split="test",
    )

    def batches():
        x, t, idx = roll[0]
        yield x[None], t[None], np.array([0])

    agg, arr = RMSE_rollout(zero_sampler, None, batches(), roll, 8,
                            jax.random.PRNGKey(0))
    assert np.isfinite(agg) and agg > 0
    assert arr.shape == (len(VARS), 8 // 4 + 1)
    assert (arr >= 0).all()


def test_ensemble_rollout_writes_all_members(ds):
    M, B, steps = 3, 2, 5
    engine = EnsembleRollout(zero_sampler, None, ds, members=M, steps=steps,
                             interval=6, segment=2)
    X0 = np.stack(
        [np.asarray(ds.standardize_x(ds._load_file(ds.files[i], VARS), 6))
         for i in range(B)]
    ).astype(np.float32)
    forc = np.zeros((B, steps, H, W, len(FORCINGS)), np.float32)

    out = np.full((B, M, steps + 1, H, W, len(VARS)), np.nan, np.float32)

    def write_fn(ic_start, m, lead_start, chunk):
        out[ic_start : ic_start + chunk.shape[0], m,
            lead_start : lead_start + chunk.shape[1]] = chunk

    engine.run(X0, forc, 0, write_fn)
    assert np.isfinite(out).all(), "missing writes"
    # zero-residual => all leads equal lead 0 for every member
    for m in range(M):
        for k in range(steps + 1):
            np.testing.assert_allclose(
                out[:, m, k], out[:, 0, 0], rtol=1e-4, atol=1e-4
            )


def test_eval_metric_functions():
    rng = np.random.default_rng(0)
    B, N, Hh, Ww = 3, 4, 8, 16
    y = rng.normal(size=(B, Hh, Ww)).astype(np.float32)
    lat = np.linspace(-90, 90, Hh)

    # perfect ensemble: all members == truth
    perfect = np.repeat(y[:, None], N, axis=1)
    assert lat_weighted_rmse(perfect, y, lat) < 1e-6
    assert abs(lat_weighted_crps(perfect, y, lat)) < 1e-6

    # biased ensemble
    biased = perfect + 1.0
    r = lat_weighted_rmse(biased, y, lat)
    np.testing.assert_allclose(r, 1.0, rtol=1e-5)
    # CRPS of deterministic biased ensemble = MAE = 1 (lat weights mean ~1,
    # cos-weighting over the linspace grid introduces a small deviation)
    c = lat_weighted_crps(biased, y, lat)
    np.testing.assert_allclose(c, 1.0, rtol=1e-5)

    # dispersed ensemble has ssr > 0
    # iid unit noise per member: spread ~1, ensemble-mean error ~1/sqrt(N)
    # -> ssr ~ sqrt(N) = 2
    spreaded = perfect + rng.normal(size=perfect.shape).astype(np.float32)
    ssr = lat_weighted_spread_skill_ratio(spreaded, y, lat)
    assert 1.5 < ssr < 2.7


def test_generate_eval_cli_loop(ds, tmp_path):
    """Smoke the store plumbing: forecast store + truth store + evaluate()."""
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.data.samplers import AttributeSubset
    from swift_tpu.eval.metrics import evaluate
    from swift_tpu.utils.io import create_forecast_zarr
    from swift_tpu.utils import zarr_lite

    indices = [0, 2]
    subset = AttributeSubset(ds, indices)
    ofile = str(tmp_path / "pred.zarr")
    create_forecast_zarr(ofile, subset, members=2, steps=2, interval=6,
                         batch=2, indices=indices)
    g = zarr_lite.open_group(ofile)
    rng = np.random.default_rng(0)
    for var in ("2m_temperature",):
        g[var][:, :, :] = rng.normal(size=(2, 2, 3, H, W)).astype(np.float32)
    for var in ("geopotential", "temperature"):
        g[var][:, :, :] = rng.normal(size=(2, 2, 3, 1, H, W)).astype(np.float32)

    truth = str(tmp_path / "truth.zarr")
    build_truth_zarr(ds, truth, workers=2)

    metrics = evaluate(truth, ofile)
    assert any(k.startswith("rmse_geopotential_500") for k in metrics)
    assert any(k.startswith("crps_2m_temperature") for k in metrics)
    assert all(np.isfinite(v) for v in metrics.values())
