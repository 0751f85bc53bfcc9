"""zarr_lite store tests: round-trips, partial chunks, consolidation."""

import json

import numpy as np
import pytest

from swift_tpu.utils import zarr_lite


def test_array_roundtrip(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    data = np.random.default_rng(0).normal(size=(10, 4, 6)).astype(np.float32)
    a = g.create_array("x", data.shape, (3, 4, 6), "<f4", data=data)
    back = np.asarray(g["x"])
    np.testing.assert_array_equal(back, data)


def test_partial_chunk_rmw(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    g.create_array("x", (8, 8), (4, 4), "<f4", fill_value=0.0)
    a = g["x"]
    a[1:3, 2:7] = 5.0
    out = a[0:8, 0:8]
    assert out[1, 2] == 5.0 and out[2, 6] == 5.0
    assert out[0, 0] == 0.0 and out[3, 2] == 0.0
    assert out[1:3, 2:7].sum() == 5.0 * 2 * 5


def test_int_indexing(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    g.create_array("x", data.shape, (1, 3, 4), "<f4", data=data)
    np.testing.assert_array_equal(g["x"][1], data[1])
    np.testing.assert_array_equal(g["x"][0, 2], data[0, 2])
    # write with squeezed value (missing singleton dims)
    g["x"][0, 0:2] = np.ones((2, 4), np.float32) * 7
    assert (g["x"][0, 0:2] == 7).all()


def test_datetime_arrays(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    times = np.array(["2000-01-01T00:00", "2000-01-01T06:00"], dtype="datetime64[ns]")
    g.create_array("time", times.shape, times.shape, times.dtype,
                   fill_value=None, dims=["time"], data=times)
    back = np.asarray(g["time"])
    np.testing.assert_array_equal(back, times)
    meta = json.loads((tmp_path / "s.zarr/time/.zarray").read_text())
    assert meta["dtype"] == "<M8[ns]"


def test_consolidated_metadata(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    g.create_array("a", (4,), (4,), "<f4", dims=["x"])
    g.consolidate_metadata()
    zm = json.loads((tmp_path / "s.zarr/.zmetadata").read_text())
    assert zm["zarr_consolidated_format"] == 1
    assert "a/.zarray" in zm["metadata"]
    assert zm["metadata"]["a/.zattrs"]["_ARRAY_DIMENSIONS"] == ["x"]


def test_compression_roundtrip(tmp_path):
    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    data = np.zeros((100, 100), np.float32)  # compresses well
    g.create_array("x", data.shape, (50, 50), "<f4", data=data, compressor="zlib")
    chunk_file = tmp_path / "s.zarr/x/0.0"
    assert chunk_file.stat().st_size < 50 * 50 * 4  # actually compressed
    np.testing.assert_array_equal(np.asarray(g["x"]), data)


def _zarr_available():
    import importlib.util

    try:
        spec = importlib.util.find_spec("zarr")
    except ValueError:
        # tests/reference_import.py installs a STUB sys.modules["zarr"]
        # (spec-less) so the reference package can import; that stub is not
        # a readable zarr implementation.
        return False
    return spec is not None and getattr(spec, "origin", None) is not None


@pytest.mark.skipif(not _zarr_available(), reason="zarr not installed")
def test_readable_by_real_zarr(tmp_path):
    import zarr as real_zarr

    g = zarr_lite.open_group(tmp_path / "s.zarr", mode="w")
    data = np.random.default_rng(1).normal(size=(6, 5)).astype(np.float32)
    g.create_array("x", data.shape, (2, 5), "<f4", data=data)
    z = real_zarr.open_group(str(tmp_path / "s.zarr"))
    np.testing.assert_array_equal(z["x"][:], data)
