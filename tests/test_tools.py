"""Tests for the HP-sweep tool, plotting, and the WB2->h5 dataset builder."""

import os

import numpy as np
import pytest

from swift_tpu.data.era5 import ERA5Dataset
from swift_tpu.data.synthetic import make_synthetic_era5

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    return make_synthetic_era5(str(root), VARS, [], n_train=16, n_test=8,
                               shape=(8, 16))


def test_sampler_sweep(data_root, tmp_path):
    import argparse

    import jax.numpy as jnp

    from swift_tpu.eval.sampler import sweep

    ds = ERA5Dataset(root=data_root, variables=VARS, residual=True, split="test")

    class ToyPrecond:
        """Minimal precond contract for param_sampler_factory."""

        sigma_data = 1.0
        sigma_min = 0.0
        sigma_max = float("inf")
        img_channels = len(VARS)
        img_resolution = (8, 16)

        def apply(self, params, x, t, condition=None, auxiliary=None, **kw):
            return jnp.zeros_like(x)

    def batches():
        xs, ts = [], []
        for i in range(4):
            (x, t), _ = ds[(i, 1, 6)]
            xs.append(x)
            ts.append(t)
        yield np.stack(xs), np.stack(ts)

    args = argparse.Namespace(
        num_steps=[1, 2], sigma_min=[0.02], sigma_max=[200.0],
        seed=0, solver="scm",
    )
    results = sweep(ToyPrecond(), {}, ds, batches, str(tmp_path), args)
    assert len(results) == 2
    assert os.path.exists(tmp_path / "sampler_results.csv")
    assert all(np.isfinite(r["overall_error"]) for r in results)


def test_plotting_gifs(data_root, tmp_path):
    from swift_tpu.data.samplers import AttributeSubset
    from swift_tpu.plotting.animate_panel import animate_panel
    from swift_tpu.plotting.rollout import animate_rollout
    from swift_tpu.utils.io import create_forecast_zarr
    from swift_tpu.utils.zarr_lite import open_group

    ds = ERA5Dataset(root=data_root, variables=VARS, residual=True, split="test")
    subset = AttributeSubset(ds, [0, 1])
    ofile = str(tmp_path / "p.zarr")
    create_forecast_zarr(ofile, subset, members=2, steps=2, indices=[0, 1])
    g = open_group(ofile)
    rng = np.random.default_rng(0)
    g["2m_temperature"][:, :, :] = rng.normal(size=(2, 2, 3, 8, 16))
    g["geopotential"][:, :, :] = rng.normal(size=(2, 2, 3, 1, 8, 16))
    g["temperature"][:, :, :] = rng.normal(size=(2, 2, 3, 1, 8, 16))

    out1 = animate_rollout(ofile, "2m_temperature", str(tmp_path / "a.gif"))
    assert os.path.getsize(out1) > 0
    out2 = animate_panel(
        ofile, ["2m_temperature", "geopotential_500"], str(tmp_path / "b.gif")
    )
    assert os.path.getsize(out2) > 0


def test_process_one_step_builder(tmp_path):
    """zarr-v2 truth-style source -> per-timestep h5 -> loadable dataset."""
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.data.process_one_step_era5 import build

    # build a source store from synthetic h5 (round-trip through our own
    # tooling exercises both the reader and the writer)
    src_root = make_synthetic_era5(
        str(tmp_path / "src"), VARS, [], n_train=12, n_val=1, n_test=1, shape=(8, 16)
    )
    src_ds = ERA5Dataset(root=src_root, variables=VARS, split="train")
    source = str(tmp_path / "wb2.zarr")
    build_truth_zarr(src_ds, source, workers=2)

    out = build(
        source, str(tmp_path / "h5out"), VARS,
        {"train": 0.6, "val": 0.2, "test": 0.2}, workers=2,
    )
    ds = ERA5Dataset(root=out, variables=VARS, residual=True, split="train")
    (x, t), (idx, delta) = ds[0]
    assert x.shape == (8, 16, 3)
    assert np.isfinite(x).all() and np.isfinite(t).all()
    # stats files written
    for f in ["normalize_mean.npz", "normalize_std.npz", "normalize_diff_std_6.npz"]:
        assert os.path.exists(os.path.join(out, f)), f
    # times preserved through the pipeline
    t0 = ds.get_time(0)
    assert str(t0).startswith("2000-")
