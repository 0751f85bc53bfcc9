"""Sampler factory (reference: src/swift/generating/factory.py:8-97).

``sampler_factory(mode, net, **solver_kwargs)`` returns a jit-friendly
closure ``sampler(X, key, auxiliary=None)`` that draws fresh latents from
``key`` and runs the chosen solver conditioned on ``X`` (NHWC).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from swift_tpu.sampling import solvers

_SOLVERS = {
    "edm": solvers.edm_sampler,
    "scm": solvers.scm_solver,
    "2s": solvers.dpm_solver_2s,
    "dpm": solvers.dpm_solver,
    "ablation": solvers.ablation_sampler,
}


def sampler_factory(mode: str, net, **solver_kwargs) -> Callable[..., jnp.ndarray]:
    if mode not in _SOLVERS:
        raise ValueError(f"Unknown solver mode: {mode}")
    solver = _SOLVERS[mode]
    # auxiliary may come from config (e.g. interval Δ/10, reference
    # configs/solver/*.yaml "auxiliary: 0.6"); a call-time value overrides.
    cfg_aux = solver_kwargs.pop("auxiliary", None)

    def sampler(X: jnp.ndarray, key: jax.Array, auxiliary=None) -> jnp.ndarray:
        aux = auxiliary if auxiliary is not None else cfg_aux
        lat_key, solve_key = jax.random.split(key)
        H, W = net.img_resolution
        latents = jax.random.normal(
            lat_key, (X.shape[0], H, W, net.img_channels), jnp.float32
        )
        return solver(
            net,
            latents,
            condition=X,
            auxiliary=aux,
            key=solve_key,
            **solver_kwargs,
        )

    return sampler


def param_sampler_factory(mode: str, precond, **solver_kwargs):
    """Like ``sampler_factory`` but params stay an explicit argument:
    ``sampler(params, X, key, auxiliary=None)``.

    USE THIS AT EVERY jit BOUNDARY. A net-closure sampler captures the
    parameter pytree as jaxpr CONSTANTS — the weights get baked into the
    serialized HLO (hundreds of MB for the flagship model), ballooning
    compile requests/cache entries; passing params as an argument keeps the
    program small and lets jit donate/share them.
    """
    if mode not in _SOLVERS:
        raise ValueError(f"Unknown solver mode: {mode}")
    solver = _SOLVERS[mode]
    cfg_aux = solver_kwargs.pop("auxiliary", None)

    def sampler(params, X, key, auxiliary=None):
        from swift_tpu.models.precond import Network

        aux = auxiliary if auxiliary is not None else cfg_aux
        lat_key, solve_key = jax.random.split(key)
        H, W = precond.img_resolution
        latents = jax.random.normal(
            lat_key, (X.shape[0], H, W, precond.img_channels), jnp.float32
        )
        return solver(
            Network(precond, params),
            latents,
            condition=X,
            auxiliary=aux,
            key=solve_key,
            **solver_kwargs,
        )

    return sampler
