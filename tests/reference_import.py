"""Import the ACTUAL reference implementation from /root/reference/src.

The reference depends on omegaconf / hydra / ezpz which are not installed
here; none of them affect the numerics under test (omegaconf only provides
type annotations, hydra only ``instantiate``-by-_target_, ezpz only a
logger), so we install minimal stand-ins into sys.modules before importing.

Used by the golden parity tests (tests/test_reference_parity.py and the
backbone converter tests): the correctness north star is forward/forecast
agreement with the reference's own code, not with a transcription.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import logging
import sys
import types

REFERENCE_SRC = "/root/reference/src"


def _stub_module(name: str) -> types.ModuleType:
    """A stub module with a real (origin-less) ModuleSpec.

    A bare ``types.ModuleType`` has ``__spec__ = None``, which makes
    ``importlib.util.find_spec(name)`` RAISE ValueError for any later
    caller (torch dynamo probes find_spec("xarray") and crashes on the
    spec-less stub). An origin-less spec keeps find_spec well-behaved
    while still marking the module as not-a-real-installation
    (``spec.origin is None``)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _hydra_instantiate(cfg, **kwargs):
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    kwargs.pop("_convert_", None)
    cfg.update({k: v for k, v in kwargs.items() if not k.startswith("_")})
    mod, name = target.rsplit(".", 1)
    return getattr(importlib.import_module(mod), name)(**cfg)


def install_reference_stubs() -> None:
    if "omegaconf" not in sys.modules:
        om = _stub_module("omegaconf")

        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        om.ListConfig = ListConfig
        om.DictConfig = DictConfig

        class OmegaConf:  # only load/to_yaml are referenced, in main() paths
            pass

        om.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = om

    if "ezpz" not in sys.modules:
        ez = _stub_module("ezpz")
        ez.get_logger = logging.getLogger
        ez.get_rank = lambda: 0
        ez.get_world_size = lambda: 1
        ez.get_local_rank = lambda: 0
        ez.get_torch_device = lambda **k: "cpu"
        ez.get_torch_device_type = lambda: "cpu"

        class _History:  # metric sink only (trainer.py:125, :437)
            def update(self, *a, **k):
                pass

        ez.History = _History
        sys.modules["ezpz"] = ez

    if "hydra" not in sys.modules:
        hydra = _stub_module("hydra")
        utils = _stub_module("hydra.utils")
        utils.instantiate = _hydra_instantiate
        hydra.utils = utils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = utils

    # swift.utils.io / swift.training.validate pull in mpi4py, dask, xarray,
    # zarr and torchinfo at import time; none of them touch the math under
    # test (io only uses them in store helpers, validate only in main()).
    if "mpi4py" not in sys.modules:
        mpi4py = _stub_module("mpi4py")
        mpi = _stub_module("mpi4py.MPI")

        class _Comm:
            def Barrier(self):
                pass

            def Get_rank(self):
                return 0

            def Get_size(self):
                return 1

        mpi.COMM_WORLD = _Comm()
        mpi4py.MPI = mpi
        sys.modules["mpi4py"] = mpi4py
        sys.modules["mpi4py.MPI"] = mpi

    for name in ("xarray", "zarr"):
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                stub = _stub_module(name)
                if name == "xarray":
                    # trainer.py:309 uses xarray.Dataset as a type annotation
                    stub.Dataset = type("Dataset", (), {})
                sys.modules[name] = stub

    if "dask" not in sys.modules:
        try:
            importlib.import_module("dask.array")
        except ImportError:
            dask = _stub_module("dask")
            dask_array = _stub_module("dask.array")
            dask.array = dask_array
            sys.modules["dask"] = dask
            sys.modules["dask.array"] = dask_array

    if "torchinfo" not in sys.modules:
        try:
            importlib.import_module("torchinfo")
        except ImportError:
            ti = _stub_module("torchinfo")
            ti.summary = lambda *a, **k: None
            sys.modules["torchinfo"] = ti


def import_reference():
    """Returns the reference ``swift`` package (models importable)."""
    install_reference_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import swift  # noqa: F401
    import swift.generating.diffusion  # noqa: F401
    import swift.models.precond  # noqa: F401
    import swift.models.swinv2  # noqa: F401

    return swift
