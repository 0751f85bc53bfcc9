"""Logging helpers (reference: src/swift/utils/io.py:26-62).

``log0`` logs only from process 0 (in JAX, ``jax.process_index() == 0``).
The zarr store writers live in ``swift_tpu.utils.zarr_lite``.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def _configure():
    global _CONFIGURED
    if _CONFIGURED:
        return
    logging.basicConfig(
        stream=sys.stdout,
        level=logging.INFO,
        format="[%(asctime)s][%(name)s][%(levelname)s] %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    _CONFIGURED = True


def get_logger(name: str = "swift_tpu") -> logging.Logger:
    _configure()
    return logging.getLogger(name)


def setup_compilation_cache(path: str = None):
    """Enable jax's persistent compilation cache (big XLA programs take
    minutes to compile; the cache makes repeat CLI invocations start hot).

    The DEFAULT directory is scoped by backend: a session whose compiles
    happen on a remote service (dev-tunnel TPU) also caches XLA:CPU
    executables AOT-compiled with the REMOTE host's CPU features, and a
    later local CPU process that loads one can die with SIGILL (jax's
    cache key does not cover CPU machine features; observed killing one
    rank of the 2-process CI test, r5). Backend-scoped subdirs keep those
    entries where only same-backend sessions look. An explicit ``path`` /
    ``SWIFT_COMPILE_CACHE`` is honored verbatim."""
    import jax

    path = path or os.environ.get("SWIFT_COMPILE_CACHE")
    if path is None:
        base = os.path.join(os.path.expanduser("~"), ".cache", "swift_tpu_jax")
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        path = os.path.join(base, backend)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_keepalive_thread = None


def start_device_keepalive(interval_s: float = 20.0):
    """Keep the device connection alive through long host-side phases.

    The dev-tunnel transport drops TCP connections that sit idle for
    ~90 s (measured 2026-08-20: an op after a 90 s sleep hangs forever —
    the PJRT client does not reconnect). Long host-side phases (loading a
    2.7 GB checkpoint npz, building a truth zarr, scoring) therefore kill
    the session's device handle. A daemon thread issuing one trivial
    device op every ``interval_s`` prevents idle closure; on production
    hosts (local PJRT/PCIe) it costs one ~µs add per interval. Disable
    with SWIFT_DEVICE_KEEPALIVE=0. Idempotent per process.
    """
    global _keepalive_thread
    if os.environ.get("SWIFT_DEVICE_KEEPALIVE", "1") == "0":
        return None
    if _keepalive_thread is not None and _keepalive_thread.is_alive():
        return _keepalive_thread
    import atexit
    import threading

    stop = threading.Event()

    def _beat():
        import jax
        import jax.numpy as jnp

        x = jnp.zeros((8,), jnp.float32)
        while not stop.is_set():
            try:
                jax.block_until_ready(x + 1.0)
            except Exception:
                pass
            stop.wait(interval_s)

    thread = threading.Thread(
        target=_beat, daemon=True, name="device-keepalive"
    )
    thread.start()
    _keepalive_thread = thread

    # a daemon thread mid-device-op at interpreter shutdown aborts the
    # process ("FATAL: exception not rethrown"); stop it cleanly first.
    def _stop():
        stop.set()
        thread.join(timeout=5.0)

    atexit.register(_stop)
    return thread


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def log0(msg, *args, logger: logging.Logger | None = None):
    if is_main_process():
        (logger or get_logger()).info(msg, *args)


# ----------------------------------------------------------------------------
# Forecast output stores (reference: src/swift/utils/io.py:85-259)


def create_forecast_zarr(
    ofile: str,
    dataset,
    members: int,
    steps: int,
    interval: int = 6,
    batch: int = 1,
    indices=None,
):
    """WB2-layout forecast store: per-variable arrays shaped
    (time, number, prediction_timedelta, [level], latitude, longitude) —
    exact parity with reference ``fast_create_empty_zarr`` (io.py:161-231),
    built on the in-tree zarr_lite writer."""
    import numpy as np

    from swift_tpu.data.constants import compress_variables
    from swift_tpu.utils import zarr_lite

    n = len(dataset)
    if indices is None:
        indices = np.arange(n, dtype=int)
    else:
        assert len(indices) == n

    lat, lon = dataset.get_lat_lon()
    n_lat, n_lon = len(lat), len(lon)
    time_coord = np.array(
        [dataset.get_time(int(i)) for i in indices], dtype="datetime64[ns]"
    )
    pred_td = (np.arange(steps + 1) * np.timedelta64(interval, "h")).astype(
        "timedelta64[ns]"
    )

    g = zarr_lite.open_group(ofile, mode="w")
    g.create_array("time", (n,), (n,), time_coord.dtype, fill_value=None,
                   dims=["time"], data=time_coord,
                   attrs={"calendar": "proleptic_gregorian",
                          "units": "nanoseconds since 1970-01-01"})
    g.create_array("prediction_timedelta", (steps + 1,), (steps + 1,),
                   pred_td.dtype, fill_value=None,
                   dims=["prediction_timedelta"], data=pred_td)
    g.create_array("latitude", (n_lat,), (n_lat,), lat.dtype, fill_value=None,
                   dims=["latitude"], data=lat)
    g.create_array("longitude", (n_lon,), (n_lon,), lon.dtype, fill_value=None,
                   dims=["longitude"], data=lon)
    g.create_array("number", (members,), (members,), "<i4", fill_value=None,
                   dims=["number"], data=np.arange(members, dtype=np.int32))

    compressed = compress_variables(dataset.variables)
    if any(len(lv) for lv in compressed.values()):
        level_sets = [lv for lv in compressed.values() if lv]
        # store REAL pressure values when all multi-level vars share them
        # (improvement over the reference's np.arange, io.py:199, which
        # breaks eval naming for level subsets).
        if all(lv == level_sets[0] for lv in level_sets):
            levels = np.asarray(level_sets[0], np.int32)
        else:
            levels = np.arange(max(len(lv) for lv in level_sets), dtype=np.int32)
        g.create_array("level", (len(levels),), (len(levels),), "<i4",
                       fill_value=None, dims=["level"], data=levels)

    for var, levels in compressed.items():
        has_levels = bool(levels)
        shape = (
            (n, members, steps + 1, n_lat, n_lon)
            if not has_levels
            else (n, members, steps + 1, len(levels), n_lat, n_lon)
        )
        # one chunk per (ic-batch, member, lead): segment writes are always
        # whole chunks (no read-modify-write of a 200 MB lead-spanning chunk
        # per 10-step segment — measured 100x slower), and eval walks lead
        # times, so per-lead chunks are also the read-friendly layout.
        chunks = (
            (batch, 1, 1, n_lat, n_lon)
            if not has_levels
            else (batch, 1, 1, len(levels), n_lat, n_lon)
        )
        dims = (
            ["time", "number", "prediction_timedelta", "latitude", "longitude"]
            if not has_levels
            else [
                "time", "number", "prediction_timedelta", "level",
                "latitude", "longitude",
            ]
        )
        # record the variable's own pressure levels so eval can name them
        # even when variables carry different level subsets.
        attrs = {"levels": list(levels)} if has_levels else None
        # single-writer context (process 0 behind a barrier, generate.py):
        # clear any stale chunks from a previous same-layout run so a rerun
        # can't silently serve old forecasts.
        g.create_array(var, shape, chunks, "<f4", fill_value=0.0, dims=dims,
                       attrs=attrs, overwrite_chunks=True)
    return g


def create_empty_numpy(ofile: str, dataset, members: int, steps: int):
    """(samples, members, steps+1, channels, H, W) float32 memmap
    (reference io.py:237-259)."""
    import numpy as np

    return np.lib.format.open_memmap(
        ofile,
        dtype=np.float32,
        mode="w+",
        shape=(
            len(dataset),
            members,
            steps + 1,
            dataset.n_target_channels,
            *dataset.img_resolution,
        ),
    )
