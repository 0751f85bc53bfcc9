"""Native (C++) packed-loader tests: build, gather, fused batch parity."""

import os

import numpy as np
import pytest

from swift_tpu.data.era5 import ERA5Dataset
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.native import PackedDataset, _get_lib
from swift_tpu.native.pack import pack_split

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = tmp_path_factory.mktemp("pack")
    make_synthetic_era5(str(root), VARS, FORCINGS, n_train=12, shape=(8, 16))
    ds = ERA5Dataset(root=str(root), variables=VARS, forcings=FORCINGS,
                     residual=True, split="train")
    out = pack_split(ds, str(root / "train.pack"))
    return ds, out


def test_native_lib_builds():
    assert _get_lib() is not None, "g++ build of loader.cpp failed"


def test_pack_and_gather(packed):
    ds, path = packed
    pd = PackedDataset(path)
    assert pd.shape == (12, 8, 16, len(VARS) + len(FORCINGS))
    rows = np.array([0, 3, 7])
    out = pd.gather(rows)
    for j, r in enumerate(rows):
        ref = ds._load_file(ds.files[r], VARS + FORCINGS)
        np.testing.assert_allclose(out[j], ref, rtol=1e-6)
    pd.close()


def test_fused_batch_matches_python_dataset(packed):
    ds, path = packed
    pd = PackedDataset(path)
    nv = len(VARS)
    idx = np.array([0, 2, 5])
    delta = 24  # no SST in VARS, delta irrelevant to zeroing here
    tgt = idx + delta // 6
    prev = idx  # offset=1: prev state is the condition itself

    x_mean = ds.x_means.reshape(-1)
    x_std = ds.x_stds.reshape(-1)
    t_std = ds.t_stds[delta].reshape(-1)

    x_out, t_out = pd.batch(idx, tgt, prev, x_mean, x_std, t_std, nv)

    for j, i in enumerate(idx):
        (x_ref, t_ref), _ = ds[(int(i), 1, delta)]
        np.testing.assert_allclose(x_out[j], x_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(t_out[j], t_ref, rtol=1e-5, atol=1e-5)
    pd.close()


def test_batchloader_pack_fast_path(packed):
    """BatchLoader with a .pack present produces batches identical to the
    h5 path for uniform-delta single-step specs."""
    from swift_tpu.data.pipeline import BatchLoader

    ds, path = packed

    class FixedSampler:
        def __iter__(self):
            yield from [(0, 1, 12), (2, 1, 12), (4, 1, 12)]

    fast = BatchLoader(ds, FixedSampler(), batch_size=3, num_workers=2)
    assert fast._pack is not None, "pack fast path not engaged"
    slow = BatchLoader(ds, FixedSampler(), batch_size=3, num_workers=2,
                       use_pack=False)
    fb = next(iter(fast))
    sb = next(iter(slow))
    np.testing.assert_allclose(fb["x"], sb["x"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fb["t"], sb["t"], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(fb["idx"], sb["idx"])
    np.testing.assert_allclose(fb["delta"], sb["delta"], rtol=1e-6)


def test_numpy_fallback_matches_native(packed):
    ds, path = packed
    pd_native = PackedDataset(path)
    if pd_native._handle is None:
        pytest.skip("native lib unavailable; fallback is the only path")
    pd_np = PackedDataset(path)
    pd_np._handle = None  # force fallback
    import swift_tpu.native as nat

    with open(path, "rb") as f:
        head = f.read(nat.HEADER_BYTES)
    dims = np.frombuffer(head[8:40], np.int64)
    pd_np._mm = np.memmap(path, np.float32, "r", offset=nat.HEADER_BYTES,
                          shape=tuple(int(d) for d in dims))
    rows = np.array([1, 4])
    np.testing.assert_allclose(pd_native.gather(rows), pd_np.gather(rows))


def test_batchloader_pack_mixed_delta_and_determinism(packed):
    """Mixed-delta batches (the sCM pretraining case: plain-int specs,
    delta drawn per sample) ride the native path as grouped sub-calls, and
    the delta stream is a pure function of the dataset seed: the pack and
    h5 paths produce IDENTICAL batches. Before r5 the h5 path drew deltas
    inside worker threads in nondeterministic completion order, the pack
    gate consumed a second set of draws before falling back, and every
    mixed batch silently fell back to the per-sample h5 path."""
    from swift_tpu.data.pipeline import BatchLoader

    ds, path = packed

    class IntSampler:  # plain ints: the pretraining spec shape
        def __iter__(self):
            yield from [0, 1, 2, 3, 4, 5]

    def one_batch(use_pack, seed):
        d = ERA5Dataset(root=ds.root, variables=VARS, forcings=FORCINGS,
                        residual=True, split="train", seed=seed)
        bl = BatchLoader(d, IntSampler(), batch_size=6, num_workers=3,
                         use_pack=use_pack)
        if use_pack is not False:
            assert bl._pack is not None, "pack fast path not engaged"
        return next(iter(bl))

    fast = one_batch(None, seed=3)
    slow = one_batch(False, seed=3)
    for k in ("x", "t", "idx", "delta"):
        np.testing.assert_array_equal(fast[k], slow[k], err_msg=k)
    deltas = set(np.asarray(fast["delta"]).ravel().tolist())
    assert len(deltas) > 1, (
        "expected a mixed-delta batch at this seed; the grouped native "
        f"path was not exercised (deltas={deltas})"
    )
    # rerun at the same seed: the stream must reproduce exactly
    again = one_batch(None, seed=3)
    np.testing.assert_array_equal(fast["delta"], again["delta"])
    np.testing.assert_array_equal(fast["t"], again["t"])
