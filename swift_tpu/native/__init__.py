"""Native (C++) data-loader runtime bindings.

Builds ``loader.cpp`` lazily with g++ into a shared library and exposes it
through ctypes: mmap'ed packed datasets, thread-pooled gather and fused
standardize+residual batch assembly (the native counterpart of the
reference's DataLoader worker pool, reference src/swift/train.py:181-209).
Falls back to a numpy implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "_build" / "libswift_loader.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= (
        _HERE / "loader.cpp"
    ).stat().st_mtime:
        return ctypes.CDLL(str(_LIB_PATH))
    _LIB_PATH.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(_LIB_PATH), str(_HERE / "loader.cpp"), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(str(_LIB_PATH))
    except (subprocess.SubprocessError, OSError) as e:
        _BUILD_FAILED = True
        from swift_tpu.utils.io import get_logger

        get_logger(__name__).warning(f"native loader build failed ({e}); "
                                     "falling back to numpy")
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is None and not _BUILD_FAILED:
            lib = _build_lib()
            if lib is not None:
                lib.stl_open.restype = ctypes.c_void_p
                lib.stl_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long)]
                lib.stl_close.argtypes = [ctypes.c_void_p]
                lib.stl_gather.restype = ctypes.c_int
                lib.stl_gather.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ]
                lib.stl_batch.restype = ctypes.c_int
                lib.stl_batch.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                    ctypes.c_long,
                ]
            _LIB = lib
    return _LIB


def _lp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


HEADER_BYTES = 4096
MAGIC = b"SWIFTPK1"


class PackedDataset:
    """mmap'ed packed dataset (written by swift_tpu.native.pack)."""

    def __init__(self, path: str, n_threads: int = 0):
        self.path = str(path)
        self.n_threads = n_threads or (os.cpu_count() or 1)
        self._lib = _get_lib()
        self._handle = None
        if self._lib is not None:
            shape = (ctypes.c_long * 4)()
            h = self._lib.stl_open(self.path.encode(), shape)
            if h:
                self._handle = ctypes.c_void_p(h)
                self.shape = tuple(int(s) for s in shape)
        if self._handle is None:
            # numpy fallback: mmap via np.memmap
            with open(self.path, "rb") as f:
                head = f.read(HEADER_BYTES)
            assert head[:8] == MAGIC, f"not a swift pack file: {path}"
            dims = np.frombuffer(head[8:8 + 32], np.int64)
            self.shape = tuple(int(d) for d in dims)
            self._mm = np.memmap(
                self.path, np.float32, "r", offset=HEADER_BYTES, shape=self.shape
            )

    def __len__(self):
        return self.shape[0]

    def gather(self, rows: np.ndarray) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.int64)
        out = np.empty((len(rows), *self.shape[1:]), np.float32)
        if self._handle is not None:
            rc = self._lib.stl_gather(
                self._handle, _lp(rows), len(rows), _fp(out), self.n_threads
            )
            assert rc == 0
        else:
            out[:] = self._mm[rows]
        return out

    def batch(
        self,
        idx: np.ndarray,
        tgt: np.ndarray,
        prev: np.ndarray,
        x_mean: np.ndarray,
        x_std: np.ndarray,
        t_std: np.ndarray,
        n_vars: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Fused standardized residual batch (see loader.cpp stl_batch)."""
        N, H, W, C = len(idx), *self.shape[1:]
        idx = np.ascontiguousarray(idx, np.int64)
        tgt = np.ascontiguousarray(tgt, np.int64)
        prev = np.ascontiguousarray(prev, np.int64)
        x_mean = np.ascontiguousarray(x_mean, np.float32).reshape(-1)
        x_std = np.ascontiguousarray(x_std, np.float32).reshape(-1)
        t_std = np.ascontiguousarray(t_std, np.float32).reshape(-1)
        x_out = np.empty((N, H, W, C), np.float32)
        t_out = np.empty((N, H, W, n_vars), np.float32)
        if self._handle is not None:
            rc = self._lib.stl_batch(
                self._handle, _lp(idx), _lp(tgt), _lp(prev), N,
                _fp(x_mean), _fp(x_std), _fp(t_std), n_vars, C,
                _fp(x_out), _fp(t_out), self.n_threads,
            )
            assert rc == 0
        else:
            x = self._mm[idx]
            x_out[:] = (x - x_mean) / x_std
            t = self._mm[tgt][..., :n_vars] - self._mm[prev][..., :n_vars]
            t_out[:] = t / t_std[:n_vars]
        return x_out, t_out

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.stl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
