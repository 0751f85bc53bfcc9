"""Jit-friendly standardization: device-resident closures over dataset stats.

The ``ERA5Dataset`` standardize methods are host/numpy utilities; everything
under ``jax.jit`` (rollout scans, multistep losses) uses a ``Standardizer``
instead — a frozen bundle of jnp constants with delta-keyed residual stats
and static-delta SST zeroing (semantics of reference
src/swift/data/era5.py:110-170).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Standardizer:
    x_mean: jnp.ndarray  # (1, 1, C+F)
    x_std: jnp.ndarray
    t_mean: dict  # delta -> (1, 1, C)
    t_std: dict
    n_variables: int
    n_forcings: int
    sst_index: Optional[int]  # None if SST not a variable

    @classmethod
    def from_dataset(cls, ds) -> "Standardizer":
        sst = (
            ds.variables.index("sea_surface_temperature")
            if "sea_surface_temperature" in ds.variables
            else None
        )
        return cls(
            x_mean=jnp.asarray(ds.x_means, jnp.float32),
            x_std=jnp.asarray(ds.x_stds, jnp.float32),
            t_mean={k: jnp.asarray(v, jnp.float32) for k, v in _as_dict(ds.t_means, ds.intervals).items()},
            t_std={k: jnp.asarray(v, jnp.float32) for k, v in _as_dict(ds.t_stds, ds.intervals).items()},
            n_variables=len(ds.variables),
            n_forcings=len(ds.forcings),
            sst_index=sst,
        )

    def _slice(self, v, m, s):
        c = v.shape[-1]
        nv, nf = self.n_variables, self.n_forcings
        if c == nv:
            return m[..., :nv], s[..., :nv]
        if c == nf and nf > 0:
            return m[..., nv:], s[..., nv:]
        return m, s

    def _zero(self, v, delta: int):
        if (
            delta == 24
            or self.sst_index is None
            or v.shape[-1] == self.n_forcings
        ):
            return v
        return v.at[..., self.sst_index].set(0.0)

    def std_x(self, v, delta: int = 6):
        m, s = self._slice(v, self.x_mean, self.x_std)
        return self._zero((v - m) / s, delta)

    def unstd_x(self, v, delta: int = 6):
        m, s = self._slice(v, self.x_mean, self.x_std)
        return self._zero(v * s + m, delta)

    def std_t(self, v, delta: int = 6):
        m, s = self._slice(v, self.t_mean[delta], self.t_std[delta])
        return self._zero((v - m) / s, delta)

    def unstd_t(self, v, delta: int = 6):
        m, s = self._slice(v, self.t_mean[delta], self.t_std[delta])
        return self._zero(v * s + m, delta)

    def loss_std_fns(self):
        """(unstd_t, unstd_x, std_x) triple the multistep losses consume."""
        return (self.unstd_t, self.unstd_x, self.std_x)


def _as_dict(stats, intervals):
    if isinstance(stats, dict):
        return stats
    return {i: np.asarray(stats)[..., :] for i in intervals}
