"""Logging helpers (reference: src/swift/utils/io.py:26-62).

``log0`` logs only from process 0 (in JAX, ``jax.process_index() == 0``).
The zarr store writers live in ``swift_tpu.utils.zarr_lite``.
"""

from __future__ import annotations

import logging
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


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def log0(msg, *args, logger: logging.Logger | None = None):
    if is_main_process():
        (logger or get_logger()).info(msg, *args)
