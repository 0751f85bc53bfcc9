"""Training-stats collection (reference: src/swift/utils/stats.py).

StyleGAN-style moment accumulators: each ``report(name, value)`` adds
``[n, Σx, Σx²]``; a ``Collector`` snapshot exposes num/mean/std per name.

TPU-first difference: values reported from inside the jitted train step are
already globally-reduced device scalars (jnp means over mesh-sharded
arrays), so the reference's per-tick ``all_reduce`` over a packed moment
tensor (stats.py:283-315) is unnecessary in-process. For multi-host runs,
``Collector.update`` aggregates moments across processes with
``multihost_utils.process_allgather`` when more than one process exists.
"""

from __future__ import annotations

import re


import numpy as np

_moments: dict[str, np.ndarray] = {}


def report(name: str, value) -> None:
    """Accumulate a scalar or array of values under ``name``."""
    v = np.asarray(value, np.float64).reshape(-1)
    if v.size == 0:
        return
    m = _moments.setdefault(name, np.zeros(3))
    m += [v.size, v.sum(), np.square(v).sum()]


def report0(name: str, value) -> None:
    """Report only on process 0 (reference stats.py:141-151 semantics)."""
    from swift_tpu.utils.io import is_main_process

    if is_main_process():
        report(name, value)


class Collector:
    """Snapshot of accumulated moments; ``update()`` drains the global
    accumulator (cross-process aggregated if multi-host)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: dict[str, np.ndarray] = {}

    def names(self):
        return [n for n in _moments if self._regex.fullmatch(n)]

    def update(self) -> None:
        if not self._keep_previous:
            self._moments.clear()
        pending = {n: _moments.pop(n) for n in list(_moments) if self._regex.fullmatch(n)}
        pending = self._cross_process(pending)
        for n, m in pending.items():
            self._moments[n] = self._moments.get(n, np.zeros(3)) * 0 + m

    @staticmethod
    def _cross_process(pending: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        try:
            import jax

            if jax.process_count() > 1 and pending:
                from jax.experimental import multihost_utils

                names = sorted(pending)
                packed = np.stack([pending[n] for n in names])
                gathered = np.asarray(
                    multihost_utils.process_allgather(packed)
                ).reshape(jax.process_count(), len(names), 3)
                summed = gathered.sum(axis=0)
                return {n: summed[i] for i, n in enumerate(names)}
        except Exception:
            pass
        return pending

    def num(self, name: str) -> int:
        return int(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        m = self._moments.get(name, np.zeros(3))
        return float(m[1] / m[0]) if m[0] else float("nan")

    def std(self, name: str) -> float:
        m = self._moments.get(name, np.zeros(3))
        if m[0] <= 1:
            return 0.0
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> dict:
        return {
            name: {"num": self.num(name), "mean": self.mean(name), "std": self.std(name)}
            for name in self._moments
        }

    def __getitem__(self, name: str) -> float:
        return self.mean(name)


default_collector = Collector()


# ----------------------------------------------------------------------------
# Profiling / distributed-consistency tooling (reference stats.py:39-50,81-87)


def profiled_function(fn):
    """Decorator: wrap a function in a jax.profiler trace annotation
    (equivalent of the reference's record_function decorator)."""
    import functools

    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


def check_replica_consistency(tree, name: str = "params") -> bool:
    """Verify a replicated pytree is bit-identical across processes —
    the mesh-world analogue of the reference's broadcast-and-compare
    ``check_ddp_consistency`` (stats.py:39-50). Single-process: trivially
    true. Multi-process: compares per-leaf checksums via process_allgather.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    leaves = jax.tree_util.tree_leaves(tree)
    sums = np.asarray(
        [float(np.asarray(l, np.float64).sum()) for l in leaves], np.float64
    )
    gathered = np.asarray(multihost_utils.process_allgather(sums))
    ok = bool(np.all(gathered == gathered[0]))
    if not ok:
        bad = np.where(~np.all(gathered == gathered[0], axis=0))[0]
        raise AssertionError(
            f"replica mismatch in {name}: {len(bad)} leaves differ "
            f"(first at flat index {bad[0]})"
        )
    return ok
