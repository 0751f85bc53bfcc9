"""Preconditioning wrappers around backbone models.

Functional re-design of the reference preconditioners
(reference: src/swift/models/precond.py:39-151):

  * ``EDMPrecond`` — EDM c_skip/c_out/c_in/c_noise scaling around any model,
    ``D_x = c_skip·x + c_out·F(c_in·x, log(σ)/4)`` (reference :80-91);
  * ``PassPrecond`` — identity wrapper for TrigFlow/sCM v-prediction
    (reference :133-148).

Both concatenate condition channels (channel-last here) and broadcast the
auxiliary (interval Δ) conditioning. A precond is a frozen dataclass holding
the model *definition*; parameters live in a separate pytree so the whole
thing stays jit/grad/jvp-transparent. ``Network`` bundles (precond, params)
into the ``net(x, t, condition, auxiliary)`` callable the solvers consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def process_auxiliary(
    auxiliary, auxiliary_dim: int, batch_size: int
) -> Optional[jnp.ndarray]:
    """Broadcast auxiliary conditioning to (B, auxiliary_dim).

    Mirrors reference precond.py:21-31: None with auxiliary_dim>0 becomes
    zeros; scalars broadcast over the batch.
    """
    if auxiliary_dim == 0:
        return None
    if auxiliary is None:
        return jnp.zeros((batch_size, auxiliary_dim), jnp.float32)
    aux = jnp.asarray(auxiliary, jnp.float32)
    if aux.ndim == 0 or aux.size == 1:
        aux = jnp.broadcast_to(aux.reshape(()), (batch_size,))
    return aux.reshape(batch_size, auxiliary_dim)


@dataclasses.dataclass(frozen=True)
class BasePrecond:
    model: nn.Module
    img_resolution: tuple[int, int]
    img_channels: int
    condition_channels: int = 0
    auxiliary_dim: int = 0
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 1.0
    # Optional parallel.pipeline.PipelineSpec: when set, the model forward
    # runs pipeline-parallel over the spec's mesh (prediction paths only) —
    # see parallel/pipeline.pipelined_precond.
    pipeline: Any = None

    # ---- parameter init -------------------------------------------------
    def init(self, rng: jax.Array) -> Any:
        H, W = self.img_resolution
        x = jnp.zeros((1, H, W, self.img_channels + self.condition_channels))
        t = jnp.zeros((1,))
        aux = (
            jnp.zeros((1, self.auxiliary_dim)) if self.auxiliary_dim else None
        )
        variables = self.model.init(rng, x, t, auxiliary=aux)
        return variables["params"]

    def _model_apply(self, params, arg, t, auxiliary, **kwargs):
        H, W = self.img_resolution
        if arg.shape[1:3] != (H, W):
            raise ValueError(
                f"input spatial shape {arg.shape[1:3]} does not match the "
                f"network img_resolution {(H, W)} (NHWC layout expected)"
            )
        if self.pipeline is not None:
            if kwargs:
                raise ValueError(
                    "pipeline-parallel forward supports the plain prediction "
                    f"call only (got model kwargs {sorted(kwargs)}); use a "
                    "non-pipelined precond for training/logvar paths"
                )
            from swift_tpu.parallel.pipeline import pipelined_swinv2_forward

            p = self.pipeline
            return pipelined_swinv2_forward(
                self.model, {"params": params}, arg, t, auxiliary,
                mesh=p.mesh, pipe_axis=p.pipe_axis, n_micro=p.n_micro,
                data_axis=p.data_axis,
            )
        return self.model.apply({"params": params}, arg, t, auxiliary=auxiliary, **kwargs)

    def round_sigma(self, sigma):
        return jnp.asarray(sigma)


@dataclasses.dataclass(frozen=True)
class PassPrecond(BasePrecond):
    """Identity preconditioner (v-prediction models; reference :101-151)."""

    def apply(
        self,
        params,
        x: jnp.ndarray,
        t: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        auxiliary=None,
        **model_kwargs,
    ):
        aux = process_auxiliary(auxiliary, self.auxiliary_dim, x.shape[0])
        arg = x
        if condition is not None and self.condition_channels > 0:
            arg = jnp.concatenate([x, condition.astype(x.dtype)], axis=-1)
        t = jnp.asarray(t)
        return self._model_apply(params, arg, t.reshape(-1), aux, **model_kwargs)


@dataclasses.dataclass(frozen=True)
class EDMPrecond(BasePrecond):
    """EDM preconditioner (reference precond.py:39-94)."""

    sigma_data: float = 0.5

    def apply(
        self,
        params,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        auxiliary=None,
        **model_kwargs,
    ):
        B = x.shape[0]
        sigma = jnp.asarray(sigma, jnp.float32)
        sigma = jnp.broadcast_to(sigma.reshape(-1, 1, 1, 1), (B, 1, 1, 1)) if sigma.size in (1, B) else sigma.reshape(B, 1, 1, 1)
        aux = process_auxiliary(auxiliary, self.auxiliary_dim, B)

        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(sigma**2 + sd2)
        c_in = jax.lax.rsqrt(sd2 + sigma**2)
        c_noise = jnp.log(sigma) / 4.0

        arg = c_in * x
        if condition is not None and self.condition_channels > 0:
            arg = jnp.concatenate([arg, condition.astype(arg.dtype)], axis=-1)

        F_x = self._model_apply(params, arg, c_noise.reshape(-1), aux, **model_kwargs)
        return c_skip * x + c_out * F_x


@dataclasses.dataclass
class Network:
    """(precond, params) bundle exposing ``net(x, t, condition, auxiliary)``.

    The callable object solvers and losses consume; also carries the metadata
    (sigma_data, img_channels, img_resolution) those consumers read off the
    reference's wrapped module.
    """

    precond: BasePrecond
    params: Any

    def __call__(self, x, t, condition=None, auxiliary=None, **kwargs):
        return self.precond.apply(
            self.params, x, t, condition=condition, auxiliary=auxiliary, **kwargs
        )

    @property
    def sigma_data(self) -> float:
        return self.precond.sigma_data

    @property
    def sigma_min(self) -> float:
        return self.precond.sigma_min

    @property
    def sigma_max(self) -> float:
        return self.precond.sigma_max

    @property
    def img_channels(self) -> int:
        return self.precond.img_channels

    @property
    def img_resolution(self) -> tuple[int, int]:
        return self.precond.img_resolution

    def round_sigma(self, sigma):
        return jnp.asarray(sigma)
