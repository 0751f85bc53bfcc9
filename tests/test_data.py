"""Data layer tests: standardize round-trips, residual targets, samplers."""

import numpy as np
import pytest

from swift_tpu.data.era5 import ERA5Dataset, ERA5RollOutDataset
from swift_tpu.data.samplers import AttributeSubset, DeltaBatchSampler, InfiniteSampler
from swift_tpu.data.synthetic import make_synthetic_era5

VARS = ["2m_temperature", "sea_surface_temperature", "geopotential_500"]
FORCINGS = ["land_sea_mask"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("era5")
    return make_synthetic_era5(str(root), VARS, FORCINGS, n_train=16, shape=(8, 16))


@pytest.fixture(scope="module")
def ds(data_root):
    return ERA5Dataset(
        root=data_root, variables=VARS, forcings=FORCINGS, residual=True, split="train"
    )


def test_shapes_and_layout(ds):
    (x, t), (idx, delta) = ds[0]
    assert x.shape == (8, 16, len(VARS) + len(FORCINGS))  # channels-last
    assert t.shape == (8, 16, len(VARS))
    assert x.dtype == np.float32
    assert round(float(delta), 4) in (0.6, 1.2, 2.4)


def test_standardize_roundtrip(ds):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(8, 16, len(VARS))).astype(np.float32)
    # delta=24 disables SST zeroing so the round trip is exact
    back = ds.standardize_x(ds.unstandardize_x(v, delta=24), delta=24)
    np.testing.assert_allclose(back, v, rtol=1e-5, atol=1e-5)
    back_t = ds.unstandardize_t(ds.standardize_t(v, delta=24), delta=24)
    np.testing.assert_allclose(back_t, v, rtol=1e-5, atol=1e-5)


def test_zero_field_sst(ds):
    v = np.ones((8, 16, len(VARS)), np.float32)
    sst_idx = VARS.index("sea_surface_temperature")
    out = ds.standardize_x(v, delta=6)
    assert np.all(out[..., sst_idx] == 0)
    out24 = ds.standardize_x(v, delta=24)
    assert not np.all(out24[..., sst_idx] == 0)


def test_residual_target(ds, data_root):
    (x, t), (idx, delta_scaled) = ds[(0, 1, 24)]
    delta = int(round(float(delta_scaled) * 10))
    assert delta == 24
    raw_x = ds._load_file(ds.files[0], VARS)
    raw_t = ds._load_file(ds.files[0 + 24 // 6], VARS)
    expected = ds.standardize_t(raw_t - raw_x, delta)
    np.testing.assert_allclose(t, expected, rtol=1e-5, atol=1e-5)


def test_getitem_offset(ds):
    # offset=2 at delta=6: target is files[idx+2] - files[idx+1]
    (x, t), _ = ds[(3, 2, 6)]
    raw_prev = ds._load_file(ds.files[4], VARS)
    raw_t = ds._load_file(ds.files[5], VARS)
    np.testing.assert_allclose(
        t, ds.standardize_t(raw_t - raw_prev, 6), rtol=1e-5, atol=1e-5
    )


def test_infinite_sampler_rank_partition(ds):
    s0 = InfiniteSampler(ds, rank=0, num_replicas=2, shuffle=False)
    s1 = InfiniteSampler(ds, rank=1, num_replicas=2, shuffle=False)
    a = [next(iter(s0)) for _ in range(1)]
    it0, it1 = iter(s0), iter(s1)
    seq0 = [next(it0) for _ in range(4)]
    seq1 = [next(it1) for _ in range(4)]
    assert set(seq0).isdisjoint(seq1)


def test_infinite_sampler_offset_yields_tuples(ds):
    s = InfiniteSampler(ds, shuffle=True, seed=1)
    s.set_offset(3)
    it = iter(s)
    for _ in range(5):
        idx, off = next(it)
        assert off == 3
        assert idx + 2 < len(ds)


def test_infinite_sampler_offset_headroom_worst_delta(ds):
    """Every yielded (idx, offset) must be loadable at the WORST-case delta
    (24h) — regression test for the out-of-range multistep indexing the
    reference's guard allows (its TODO at era5.py:187)."""
    s = InfiniteSampler(ds, shuffle=True, seed=3)
    s.set_offset(2)
    it = iter(s)
    for _ in range(min(20, len(ds))):
        idx, off = next(it)
        (x, t), _ = ds[(idx, off, 24)]  # must not raise IndexError
        assert np.isfinite(t).all()


def test_infinite_sampler_deterministic(ds):
    s = InfiniteSampler(ds, shuffle=True, seed=7)
    seq1 = [next(iter(s)) for _ in range(1)]
    a = iter(s)
    b = iter(s)
    assert [next(a) for _ in range(8)] == [next(b) for _ in range(8)]


def test_delta_batch_sampler(ds):
    s = InfiniteSampler(ds, shuffle=True, seed=0)
    bs = DeltaBatchSampler(s, batch_size=4, intervals=[6, 12, 24], seed=0)
    it = iter(bs)
    for _ in range(3):
        batch = next(it)
        assert len(batch) == 4
        deltas = {d for (_, _, d) in batch}
        assert len(deltas) == 1 and deltas.pop() in (6, 12, 24)


def test_attribute_subset(ds):
    sub = AttributeSubset(ds, [0, 2, 4])
    assert len(sub) == 3
    assert sub.variables == VARS  # delegated
    (x, t), _ = sub[1]
    assert x.shape == (8, 16, len(VARS) + len(FORCINGS))


def test_rollout_dataset(data_root):
    ds = ERA5RollOutDataset(
        interval=8, root=data_root, variables=VARS, forcings=FORCINGS,
        residual=True, split="train",
    )
    x, t, idx = ds[0]
    assert x.shape == (8, 16, len(VARS))
    assert t.shape == (8 // 4 + 1, 8, 16, len(VARS))
