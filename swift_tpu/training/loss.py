"""Training losses — EDM, TrigFlow, sCM, multistep MSE and kernel CRPS.

Behavioral parity with the reference loss suite
(reference: src/swift/training/loss.py):

  * latitude/variable weighting (:28-55);
  * lognormal / loguniform noise samplers (:61-77);
  * ``EDMLoss`` (:95-114), ``TrigFlowLoss`` with adaptive logvar weighting
    (:117-160);
  * ``SCMLoss`` — continuous-time consistency with the JVP-rearranged
    gradient, tangent warmup and tangent normalization (:163-260). The
    reference's DDP-unwrap + hook-disable + flash-fallback dance around
    ``torch.func.jvp`` (:212-220) collapses to a single ``jax.jvp`` call;
  * ``MSELoss`` multistep (:266-303) and almost-fair kernel ``CRPSLoss``
    (:306-445) with ``jax.checkpoint`` over the autoregressive unroll in
    place of ``checkpoint_sequential`` (:429-434).

TPU-first design: losses are pure functions of (params, rng key, batch);
every loss instance closes over a ``BasePrecond`` (the model definition) and
static weighting arrays, so ``jax.value_and_grad(loss)(params, ...)`` is one
jittable program. Data layout is NHWC; channel reductions are over axis -1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from swift_tpu.models.precond import BasePrecond

PRESSURE_LEVEL_VARS = [
    "geopotential",
    "u_component_of_wind",
    "v_component_of_wind",
    "vertical_velocity",
    "wind_speed",
    "temperature",
    "relative_humidity",
    "specific_humidity",
    "vorticity",
    "potential_vorticity",
]

DEFAULT_PRESSURE_LEVELS = [
    50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000,
]


def latitude_weights(lat_dim: int) -> np.ndarray:
    """cos(lat) weights, mean-normalized, clamped >= 0.1; shape (1, H, 1, 1)
    for NHWC (reference loss.py:28-32 uses (1, 1, H, 1) for NCHW)."""
    w = np.cos(np.deg2rad(np.linspace(-90, 90, lat_dim)))
    w = w / w.mean()
    w = np.clip(w, 0.1, None)
    return w.reshape(1, -1, 1, 1).astype(np.float32)


def variable_weights(variables: list[str]) -> np.ndarray:
    """Per-variable weights, sum-normalized; shape (1, 1, 1, C) for NHWC
    (reference loss.py:35-55)."""
    single = {
        "2m_temperature": 1.0,
        "sea_surface_temperature": 0.1,
        "10m_u_component_of_wind": 0.1,
        "10m_v_component_of_wind": 0.1,
        "mean_sea_level_pressure": 0.1,
    }
    pw = [l / sum(DEFAULT_PRESSURE_LEVELS) for l in DEFAULT_PRESSURE_LEVELS]
    table = dict(single)
    for var in PRESSURE_LEVEL_VARS:
        for l, w in zip(DEFAULT_PRESSURE_LEVELS, pw):
            table[f"{var}_{l}"] = w
    w = np.array([table[v] for v in variables], np.float32)
    w = w / w.sum()
    return w.reshape(1, 1, 1, -1)


# ----------------------------------------------------------------------------
# Noise level samplers (reference loss.py:61-77)


def lognormal(key: jax.Array, batch: int, P_mean: float, P_std: float) -> jnp.ndarray:
    n = jax.random.normal(key, (batch, 1, 1, 1))
    return jnp.exp(n * P_std + P_mean)


def loguniform(
    key: jax.Array, batch: int, sigma_min: float, sigma_max: float
) -> jnp.ndarray:
    u = jax.random.uniform(key, (batch, 1, 1, 1))
    return jnp.exp(
        math.log(sigma_min) + u * (math.log(sigma_max) - math.log(sigma_min))
    )


NOISE_SAMPLING_METHODS = {"lognormal": lognormal, "loguniform": loguniform}


def _make_noise_fn(noise: dict) -> Callable[[jax.Array, int], jnp.ndarray]:
    cfg = dict(noise)
    dist = cfg.pop("dist")
    fn = NOISE_SAMPLING_METHODS[dist]
    return lambda key, batch: fn(key, batch, **cfg)


def _has_logvar(precond: BasePrecond) -> bool:
    return bool(getattr(precond.model, "logvar", False))


# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _WeightedLoss:
    precond: BasePrecond
    lat_dim: int
    variables: tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "w_lat", jnp.asarray(latitude_weights(self.lat_dim)))
        object.__setattr__(
            self, "w_var", jnp.asarray(variable_weights(list(self.variables)))
        )

    def _weighted(self, se: jnp.ndarray) -> jnp.ndarray:
        """w_var·w_lat·se summed over channels, meaned over (B, H, W)."""
        return (self.w_var * self.w_lat * se).sum(axis=-1).mean()


@dataclasses.dataclass(frozen=True)
class EDMLoss(_WeightedLoss):
    """EDM denoising score matching loss (reference loss.py:95-114)."""

    noise: dict = dataclasses.field(default_factory=dict)
    sigma_data: float = 0.5

    def __call__(self, params, key, x, condition=None, auxiliary=None, **kw):
        k_sigma, k_noise = jax.random.split(key)
        sigma = _make_noise_fn(self.noise)(k_sigma, x.shape[0])
        weight = (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2
        n = jax.random.normal(k_noise, x.shape) * sigma
        D_yn = self.precond.apply(params, x + n, sigma, condition, auxiliary)
        return (
            (weight * (self.w_var * self.w_lat * (D_yn - x) ** 2))
            .sum(axis=-1)
            .mean()
        )


@dataclasses.dataclass(frozen=True)
class TrigFlowLoss(_WeightedLoss):
    """TrigFlow v-prediction loss with adaptive logvar weighting
    (reference loss.py:117-160)."""

    noise: dict = dataclasses.field(default_factory=dict)
    sigma_data: float = 1.0

    def __call__(self, params, key, x, condition=None, auxiliary=None, **kw):
        k_tau, k_z = jax.random.split(key)
        tau = _make_noise_fn(self.noise)(k_tau, x.shape[0])
        t = jnp.arctan(tau / self.sigma_data)

        z = jax.random.normal(k_z, x.shape) * self.sigma_data
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        x_t = cos_t * x + sin_t * z
        v_t = cos_t * z - sin_t * x

        use_logvar = _has_logvar(self.precond)
        out = self.precond.apply(
            params,
            x_t / self.sigma_data,
            t,
            condition,
            auxiliary,
            return_logvar=use_logvar,
        )
        if isinstance(out, tuple):
            F_x, logvar = out
            logvar = logvar.reshape(-1, 1, 1, 1)
        else:
            F_x, logvar = out, jnp.zeros((x.shape[0], 1, 1, 1))

        se = self.w_var * self.w_lat * jnp.square(self.sigma_data * F_x - v_t)
        return ((1.0 / jnp.exp(logvar)) * se + logvar).sum(axis=-1).mean()


@dataclasses.dataclass(frozen=True)
class SCMLoss(_WeightedLoss):
    """Simplified/Stabilized continuous-time consistency loss
    (reference loss.py:163-260)."""

    noise: dict = dataclasses.field(default_factory=dict)
    sigma_data: float = 1.0
    tangent_warmup_kimg: int = 0
    distillation: bool = False

    def _draw(self, key, x):
        """The (t, z) noise draws — shared between the staged jvp term and
        the main loss so both stages see identical randomness."""
        k_tau, k_z = jax.random.split(key)
        tau = _make_noise_fn(self.noise)(k_tau, x.shape[0])
        t = jnp.arctan(tau / self.sigma_data)
        z = jax.random.normal(k_z, x.shape) * self.sigma_data
        return t, z

    def _dxt_dt(self, t, z, x, x_t, condition, auxiliary, teacher):
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        if self.distillation and teacher is not None:
            # frozen teacher prediction of dx_t/dt (v-prediction).
            return self.sigma_data * jax.lax.stop_gradient(
                teacher(x_t / self.sigma_data, t, condition, auxiliary)
            )
        return cos_t * z - sin_t * x

    def jvp_term(self, params, key, x, condition=None, auxiliary=None,
                 teacher=None, out_dtype=None):
        """The sCM tangent dF̂ as a STANDALONE computation.

        At large grids (0.25°) the jvp forward and the main fwd+bwd don't
        fit one device program together; jitting this separately and
        passing the result via ``dF_x=`` makes the HBM peak max() of the
        two stages instead of their sum. Must be called with the same
        ``key`` as the main loss (the (t, z) draws are re-derived)."""
        t, z = self._draw(key, x)
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        x_t = cos_t * x + sin_t * z
        dxt_dt = self._dxt_dt(t, z, x, x_t, condition, auxiliary, teacher)

        def wrapper(xi, ti):
            return self.precond.apply(params, xi, ti, condition, auxiliary, jvp=True)

        v_x = cos_t * sin_t * dxt_dt / self.sigma_data
        v_t = cos_t * sin_t
        _, dF_x = jax.jvp(wrapper, (x_t / self.sigma_data, t), (v_x, v_t))
        if out_dtype is not None:
            # bf16 handoff shrinks the cross-program buffer; dF enters the
            # loss only inside the normalized, stop-gradient'ed g.
            dF_x = dF_x.astype(out_dtype)
        return jax.lax.stop_gradient(dF_x)

    def __call__(
        self,
        params,
        key,
        x,
        step,
        condition=None,
        auxiliary=None,
        teacher=None,
        dF_x=None,
        **kw,
    ):
        t, z = self._draw(key, x)
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        x_t = cos_t * x + sin_t * z
        dxt_dt = self._dxt_dt(t, z, x, x_t, condition, auxiliary, teacher)

        if dF_x is None:
            # JVP through the model — jax.jvp replaces the reference's
            # torch.func.jvp + DDP-unwrap + hook-disable + flash-fallback
            # (reference loss.py:212-220, swinv2.py:129).
            def wrapper(xi, ti):
                return self.precond.apply(
                    params, xi, ti, condition, auxiliary, jvp=True
                )

            v_x = cos_t * sin_t * dxt_dt / self.sigma_data
            v_t = cos_t * sin_t
            _, dF_x = jax.jvp(wrapper, (x_t / self.sigma_data, t), (v_x, v_t))

        use_logvar = _has_logvar(self.precond)
        out = self.precond.apply(
            params,
            x_t / self.sigma_data,
            t,
            condition,
            auxiliary,
            return_logvar=use_logvar,
        )
        if isinstance(out, tuple):
            F_x, logvar = out
            logvar = logvar.reshape(-1, 1, 1, 1)
        else:
            F_x, logvar = out, jnp.zeros((x.shape[0], 1, 1, 1))

        # tangent warmup ramp r = min(1, step / (warmup_kimg * 1000)).
        if self.tangent_warmup_kimg > 0:
            r = jnp.minimum(1.0, step / (self.tangent_warmup_kimg * 1000))
        else:
            r = 1.0

        F_det = jax.lax.stop_gradient(F_x)
        dF_det = jax.lax.stop_gradient(dF_x)

        # JVP rearrangement (the 1/(σ_d·tan t) factor is folded into the
        # extra cos t — reference loss.py:238-241).
        g = -(cos_t**2) * (self.sigma_data * F_det - dxt_dt) - r * (
            (cos_t * sin_t) * x_t + self.sigma_data * dF_det
        )

        # tangent normalization, invariant to spatial size (reference :245-247).
        gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2, 3), keepdims=True))
        gn = gn * np.sqrt(1.0 / (g.shape[1] * g.shape[2] * g.shape[3]))
        g = g / (gn + 0.1)

        se = self.w_var * self.w_lat * jnp.square(F_x - F_det - g)
        return ((1.0 / jnp.exp(logvar)) * se + logvar).sum(axis=-1).mean()


# ----------------------------------------------------------------------------
# Multistep losses (finetuning)


@dataclasses.dataclass(frozen=True)
class MSELoss(_WeightedLoss):
    """Multistep MSE loss at t=π/2 one-shot prediction (reference :266-303).

    ``std_fns = (unstandardize_t, unstandardize_x, standardize_x)`` — jit-safe
    closures over the dataset statistics; the autoregressive condition update
    runs in physical space exactly like the reference (:299-301), but slices
    the condition to the model variables before the residual add (the
    reference's un-sliced add only type-checks without forcings).
    """

    sigma_data: float = 1.0
    std_fns: Optional[tuple] = None
    n_variables: int = 0

    def __call__(
        self, params, key, target, condition=None, auxiliary=None, steps: int = 1, **kw
    ):
        assert self.std_fns is not None
        unstd_t, unstd_x, std_x = self.std_fns
        t = jnp.float32(np.pi / 2)
        nv = self.n_variables or target.shape[-1]

        cond = condition
        pred = None
        for i in range(steps):
            x_t = jax.random.normal(jax.random.fold_in(key, i), target.shape)
            x_t = x_t * self.sigma_data
            out = self.precond.apply(
                params,
                x_t / self.sigma_data,
                jnp.broadcast_to(t, (target.shape[0],)),
                cond,
                auxiliary,
            )
            pred = self.sigma_data * out
            if i < steps - 1:
                y_unstd = unstd_t(pred)
                x_unstd = unstd_x(cond[..., :nv])
                new_vars = std_x(x_unstd + y_unstd)
                cond = jnp.concatenate([new_vars, cond[..., nv:]], axis=-1)

        return self._weighted((pred - target) ** 2)


def kernel_crps(preds: jnp.ndarray, targets: jnp.ndarray, alpha: float = 1.0):
    """Almost-fair kernel CRPS (reference loss.py:343-371).

    Args:
      preds: (..., m) ensemble members on the last axis.
      targets: (...).
    Returns:
      crps with the member axis reduced.
    """
    m = preds.shape[-1]
    assert m > 1, "Ensemble size must be greater than 1."
    epsilon = (1.0 - alpha) / m

    skill = jnp.abs(preds - targets[..., None]).mean(axis=-1)
    diffs = jnp.abs(preds[..., None, :] - preds[..., :, None])
    # zero diagonal (i == j pairs) — |x-x| is already 0, so plain sum works.
    spread = diffs.sum(axis=(-1, -2)) / (2 * m * (m - 1))
    return skill - (1 - epsilon) * spread


@dataclasses.dataclass(frozen=True)
class CRPSLoss(_WeightedLoss):
    """Multistep almost-fair kernel CRPS loss (reference loss.py:306-445).

    TPU-first differences from the reference:
      * forcings for every unroll step are PRE-STAGED into the batch as
        ``forcings_seq`` of shape (B, steps, H, W, F) — the reference reads
        h5 files inside the loss (:380-395), which would starve the TPU;
      * the autoregressive unroll uses ``jax.checkpoint`` per step instead of
        ``checkpoint_sequential`` (:429-434);
      * ``delta`` is a static argument (the whole batch shares one Δ via
        DeltaBatchSampler, as the reference assumes at :376).
    """

    sigma_data: float = 1.0
    ensemble_size: int = 2
    alpha: float = 1.0
    std_fns: Optional[tuple] = None  # (unstd_t, unstd_x, std_x), delta-aware
    n_variables: int = 0

    def _one_step(self, params, key, target, cond_vars, forcings, auxiliary, delta):
        unstd_t, unstd_x, std_x = self.std_fns
        t = jnp.float32(np.pi / 2)
        B = target.shape[0]
        x_t = jax.random.normal(key, target.shape) * self.sigma_data
        cond = jnp.concatenate([cond_vars, forcings], axis=-1)
        out = self.precond.apply(
            params, x_t / self.sigma_data, jnp.broadcast_to(t, (B,)), cond, auxiliary
        )
        # v-prediction at t=π/2: x0 = -σ_d · F (reference :397-399).
        pred = -self.sigma_data * out
        y_unstd = unstd_t(pred, delta)
        x_unstd = unstd_x(cond_vars, delta)
        next_cond = std_x(x_unstd + y_unstd, delta)
        return next_cond, pred

    def __call__(
        self,
        params,
        key,
        target,
        condition,
        auxiliary,
        forcings_seq,
        delta: int = 6,
        steps: int = 1,
        **kw,
    ):
        assert self.std_fns is not None
        nv = self.n_variables or target.shape[-1]

        def roll(cond_vars, member_key):
            def step_fn(carry, inp):
                cond_vars, k = carry
                i, forcing = inp
                k, sub = jax.random.split(k)
                next_cond, _ = self._one_step(
                    params, sub, target, cond_vars, forcing, auxiliary, delta
                )
                return (next_cond, k), None

            k0, k_last = jax.random.split(member_key)
            if steps > 1:
                ck_step = jax.checkpoint(step_fn)
                (cond_vars, _), _ = jax.lax.scan(
                    ck_step,
                    (cond_vars, k0),
                    (jnp.arange(steps - 1), forcings_seq[:, : steps - 1].swapaxes(0, 1)),
                )
            _, pred = self._one_step(
                params,
                k_last,
                target,
                cond_vars,
                forcings_seq[:, steps - 1],
                auxiliary,
                delta,
            )
            return pred

        cond_vars0 = condition[..., :nv]
        keys = jax.random.split(key, self.ensemble_size)
        preds = jnp.stack(
            [roll(cond_vars0, keys[e]) for e in range(self.ensemble_size)], axis=-1
        )  # (B, H, W, C, m)

        crps = kernel_crps(preds, target, self.alpha)  # (B, H, W, C)
        return self._weighted(crps)
