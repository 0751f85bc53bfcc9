"""Autoregressive forecast rollout as a single compiled scan.

The reference rolls out with a Python loop that reads forcings from h5
inside the loop and syncs device->host every step
(reference: src/swift/generate.py:97-136, training/validate.py:66-118).
Here the whole rollout is ONE jitted ``jax.lax.scan``:

  * forcings for all steps are pre-staged into a device array;
  * the residual update (unstandardize -> add -> restandardize) runs on
    device inside the scan;
  * the host sees data only once, at the end.

Ensemble generation vmaps/shards the same program over (member, ic) axes of
the mesh — replacing the reference's member round-robin over ranks
(generate.py:79).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from swift_tpu.data.standardize import Standardizer


def forecast_rollout(
    param_sampler: Callable,  # (params, cond, key, auxiliary=None) -> Y
    params,
    std: Standardizer,
    X0: jnp.ndarray,  # (B, H, W, C) standardized initial condition
    forcings_seq: Optional[jnp.ndarray],  # (B, steps, H, W, F) standardized
    key: jax.Array,
    steps: int,
    delta: int = 6,
    residual: bool = True,
    auxiliary=None,
) -> jnp.ndarray:
    """Returns the physical-space trajectory (B, steps+1, H, W, C).

    ``param_sampler`` comes from ``factory.param_sampler_factory`` — params
    cross the jit boundary as an argument, never as closure constants.
    """
    B = X0.shape[0]
    keys = jax.random.split(key, steps)

    if forcings_seq is not None:
        xs = {"key": keys, "forcing": forcings_seq.swapaxes(0, 1)}
    else:
        xs = {"key": keys}

    def body(X, s):
        cond = (
            jnp.concatenate([X, s["forcing"]], axis=-1) if "forcing" in s else X
        )
        Y = param_sampler(params, cond, s["key"], auxiliary=auxiliary)
        if residual:
            X_phys = std.unstd_x(X, delta) + std.unstd_t(Y, delta)
            X_next = std.std_x(X_phys, delta)
        else:
            X_phys = std.unstd_x(Y, delta)
            X_next = Y
        return X_next, X_phys

    _, traj = jax.lax.scan(body, X0, xs)
    traj = traj.swapaxes(0, 1)  # (B, steps, H, W, C)
    x0_phys = std.unstd_x(X0, delta)
    return jnp.concatenate([x0_phys[:, None], traj], axis=1)
