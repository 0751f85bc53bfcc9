"""Diffusion / consistency solvers, jit-native.

Behavioral parity with the reference sampler suite
(reference: src/swift/generating/diffusion.py):

  * ``edm_sampler``        — EDM Heun 2nd-order with S_churn (:10-92)
  * ``ablation_sampler``   — VP/VE/iDDPM/EDM superset (:94-287)
  * ``dpm_solver``         — DPM-Solver(++) 2M on TrigFlow time (:289-353)
  * ``dpm_solver_2s``      — 2nd-order Heun on v-prediction (:355-415)
  * ``scm_solver``         — multistep consistency sampler; 1 step = t=π/2
                             (:417-461); 2-step uses t₁=1.1 (:446-447)
  * ``scm_solve2``         — variant ordering of noise injection (:463-512)

TPU-first design: every schedule quantity that depends only on solver
hyper-parameters (t-steps, churn γ, 2M correction coefficients) is computed
on the host in float64 numpy and baked in as scan constants; the device
program is a single ``lax.scan`` whose body holds the net evaluation(s).
Stochastic steps take an explicit ``jax.random`` key.

``net`` is any callable ``net(x, t, condition, auxiliary) -> v/denoised``
(typically a ``swift_tpu.models.precond.Network``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NetFn = Callable[..., jnp.ndarray]


def _edm_t_steps(num_steps: int, sigma_min: float, sigma_max: float, rho: float):
    i = np.arange(num_steps, dtype=np.float64)
    ts = (
        sigma_max ** (1 / rho)
        + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    return np.concatenate([ts, [0.0]])


def _loguniform_t_steps(num_steps: int, sigma_min: float, sigma_max: float, sigma_data: float):
    u = np.linspace(1.0, 0.0, num_steps)
    tau = np.exp(np.log(sigma_min) + u * (np.log(sigma_max) - np.log(sigma_min)))
    return np.arctan(tau / sigma_data)


# ----------------------------------------------------------------------------
# EDM Heun sampler


def edm_sampler(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
) -> jnp.ndarray:
    sigma_min = max(sigma_min, net.sigma_min)
    sigma_max = min(sigma_max, net.sigma_max)
    t_steps = _edm_t_steps(num_steps, sigma_min, sigma_max, rho)

    gammas = np.array(
        [
            min(S_churn / num_steps, np.sqrt(2) - 1)
            if (S_min <= t and t <= S_max)
            else 0.0
            for t in t_steps[:-1]
        ]
    )
    t_hats = t_steps[:-1] + gammas * t_steps[:-1]
    churn_scale = np.sqrt(np.maximum(t_hats**2 - t_steps[:-1] ** 2, 0.0)) * S_noise
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_steps)

    xs = {
        "t_hat": jnp.asarray(t_hats, jnp.float32),
        "t_next": jnp.asarray(t_steps[1:], jnp.float32),
        "churn": jnp.asarray(churn_scale, jnp.float32),
        "is_not_last": jnp.arange(num_steps) < num_steps - 1,
        "key": keys,
    }

    x0 = latents.astype(jnp.float32) * float(t_steps[0])

    def body(x_cur, s):
        t_hat, t_next = s["t_hat"], s["t_next"]
        x_hat = x_cur + s["churn"] * jax.random.normal(s["key"], x_cur.shape)
        denoised = net(x_hat, t_hat, condition, auxiliary).astype(jnp.float32)
        d_cur = (x_hat - denoised) / t_hat
        x_next_euler = x_hat + (t_next - t_hat) * d_cur

        def second_order(x_next):
            denoised2 = net(x_next, t_next, condition, auxiliary).astype(jnp.float32)
            d_prime = (x_next - denoised2) / t_next
            return x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = jax.lax.cond(
            s["is_not_last"], second_order, lambda x: x, x_next_euler
        )
        return x_next, None

    x, _ = jax.lax.scan(body, x0, xs)
    return x


# ----------------------------------------------------------------------------
# Ablation sampler (VP / VE / iDDPM / EDM superset)


def ablation_sampler(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 18,
    sigma_min: Optional[float] = None,
    sigma_max: Optional[float] = None,
    rho: float = 7.0,
    solver: str = "heun",
    discretization: str = "edm",
    schedule: str = "linear",
    scaling: str = "none",
    epsilon_s: float = 1e-3,
    C_1: float = 0.001,
    C_2: float = 0.008,
    M: int = 1000,
    alpha: float = 1.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = float("inf"),
    S_noise: float = 1.0,
) -> jnp.ndarray:
    """Generalized sampler; schedules precomputed on host (reference :94-287)."""
    assert solver in ("euler", "heun")
    assert discretization in ("vp", "ve", "iddpm", "edm")
    assert schedule in ("vp", "ve", "linear")
    assert scaling in ("vp", "none")

    vp_sigma = lambda bd, bm: lambda t: np.sqrt(np.e ** (0.5 * bd * t**2 + bm * t) - 1)
    vp_sigma_deriv = lambda bd, bm: lambda t: 0.5 * (bm + bd * t) * (
        sigma(t) + 1 / sigma(t)
    )
    vp_sigma_inv = lambda bd, bm: lambda s: (
        np.sqrt(bm**2 + 2 * bd * np.log(s**2 + 1)) - bm
    ) / bd
    ve_sigma = lambda t: np.sqrt(t)
    ve_sigma_deriv = lambda t: 0.5 / np.sqrt(t)
    ve_sigma_inv = lambda s: s**2

    if sigma_min is None:
        vp_def = vp_sigma(19.9, 0.1)(epsilon_s)
        sigma_min = {"vp": vp_def, "ve": 0.02, "iddpm": 0.002, "edm": 0.002}[
            discretization
        ]
    if sigma_max is None:
        vp_def = vp_sigma(19.9, 0.1)(1.0)
        sigma_max = {"vp": vp_def, "ve": 100, "iddpm": 81, "edm": 80}[discretization]

    sigma_min = max(sigma_min, net.sigma_min)
    sigma_max = min(sigma_max, net.sigma_max)

    vp_beta_d = (
        2
        * (np.log(sigma_min**2 + 1) / epsilon_s - np.log(sigma_max**2 + 1))
        / (epsilon_s - 1)
    )
    vp_beta_min = np.log(sigma_max**2 + 1) - 0.5 * vp_beta_d

    step_indices = np.arange(num_steps, dtype=np.float64)
    if discretization == "vp":
        orig_t = 1 + step_indices / (num_steps - 1) * (epsilon_s - 1)
        sigma_steps = vp_sigma(vp_beta_d, vp_beta_min)(orig_t)
    elif discretization == "ve":
        orig_t = (sigma_max**2) * (
            (sigma_min**2 / sigma_max**2) ** (step_indices / (num_steps - 1))
        )
        sigma_steps = ve_sigma(orig_t)
    elif discretization == "iddpm":
        u = np.zeros(M + 1)
        alpha_bar = lambda j: np.sin(0.5 * np.pi * j / M / (C_2 + 1)) ** 2
        for j in range(M, 0, -1):
            u[j - 1] = np.sqrt(
                (u[j] ** 2 + 1) / max(alpha_bar(j - 1) / alpha_bar(j), C_1) - 1
            )
        u_filtered = u[np.logical_and(u >= sigma_min, u <= sigma_max)]
        sel = np.round(
            (len(u_filtered) - 1) / (num_steps - 1) * step_indices
        ).astype(int)
        sigma_steps = u_filtered[sel]
    else:
        sigma_steps = (
            sigma_max ** (1 / rho)
            + step_indices
            / (num_steps - 1)
            * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
        ) ** rho

    if schedule == "vp":
        sigma = vp_sigma(vp_beta_d, vp_beta_min)
        sigma_deriv = vp_sigma_deriv(vp_beta_d, vp_beta_min)
        sigma_inv = vp_sigma_inv(vp_beta_d, vp_beta_min)
    elif schedule == "ve":
        sigma, sigma_deriv, sigma_inv = ve_sigma, ve_sigma_deriv, ve_sigma_inv
    else:
        sigma = lambda t: t
        sigma_deriv = lambda t: np.ones_like(np.asarray(t, dtype=np.float64))
        sigma_inv = lambda s: s

    if scaling == "vp":
        s_fn = lambda t: 1 / np.sqrt(1 + sigma(t) ** 2)
        s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * (s_fn(t) ** 3)
    else:
        s_fn = lambda t: np.ones_like(np.asarray(t, dtype=np.float64))
        s_deriv = lambda t: np.zeros_like(np.asarray(t, dtype=np.float64))

    t_steps = np.concatenate([sigma_inv(sigma_steps), [0.0]])

    # Per-step host-side constants.
    t_cur = t_steps[:-1]
    t_nxt = t_steps[1:]
    gammas = np.array(
        [
            min(S_churn / num_steps, np.sqrt(2) - 1)
            if (S_min <= sigma(t) <= S_max)
            else 0.0
            for t in t_cur
        ]
    )
    t_hat = sigma_inv(sigma(t_cur) + gammas * sigma(t_cur))
    churn_gain = s_fn(t_hat) / s_fn(t_cur)
    churn_noise = (
        np.sqrt(np.maximum(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0))
        * s_fn(t_hat)
        * S_noise
    )
    h = t_nxt - t_hat
    t_prime = t_hat + alpha * h

    def _coef(t):
        # at the trailing t=0 the coefficients feed the never-taken heun
        # branch of the last step; sanitize instead of warning.
        t = np.asarray(t, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            cx = sigma_deriv(t) / sigma(t) + s_deriv(t) / s_fn(t)
            cd = sigma_deriv(t) * s_fn(t) / sigma(t)
        return np.nan_to_num(cx, posinf=0.0, neginf=0.0), np.nan_to_num(
            cd, posinf=0.0, neginf=0.0
        )

    cx_hat, cd_hat = _coef(t_hat)
    cx_pr, cd_pr = _coef(t_prime)

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_steps)

    xs = {
        "sig_hat": jnp.asarray(sigma(t_hat), jnp.float32),
        "sig_pr": jnp.asarray(sigma(t_prime), jnp.float32),
        "inv_s_hat": jnp.asarray(1.0 / s_fn(t_hat), jnp.float32),
        "inv_s_pr": jnp.asarray(1.0 / s_fn(t_prime), jnp.float32),
        "gain": jnp.asarray(churn_gain, jnp.float32),
        "noise": jnp.asarray(churn_noise, jnp.float32),
        "h": jnp.asarray(h, jnp.float32),
        "cx_hat": jnp.asarray(cx_hat, jnp.float32),
        "cd_hat": jnp.asarray(cd_hat, jnp.float32),
        "cx_pr": jnp.asarray(cx_pr, jnp.float32),
        "cd_pr": jnp.asarray(cd_pr, jnp.float32),
        "use_heun": (jnp.arange(num_steps) < num_steps - 1)
        if solver == "heun"
        else jnp.zeros(num_steps, bool),
        "key": keys,
    }

    x0 = latents.astype(jnp.float32) * float(sigma(t_steps[0]) * s_fn(t_steps[0]))

    def body(x_cur, s):
        x_hat = s["gain"] * x_cur + s["noise"] * jax.random.normal(
            s["key"], x_cur.shape
        )
        den = net(x_hat * s["inv_s_hat"], s["sig_hat"], condition, auxiliary).astype(
            jnp.float32
        )
        d_cur = s["cx_hat"] * x_hat - s["cd_hat"] * den
        x_prime = x_hat + alpha * s["h"] * d_cur
        x_euler = x_hat + s["h"] * d_cur

        def heun(_):
            den2 = net(
                x_prime * s["inv_s_pr"], s["sig_pr"], condition, auxiliary
            ).astype(jnp.float32)
            d_prime = s["cx_pr"] * x_prime - s["cd_pr"] * den2
            return x_hat + s["h"] * (
                (1 - 1 / (2 * alpha)) * d_cur + 1 / (2 * alpha) * d_prime
            )

        x_next = jax.lax.cond(s["use_heun"], heun, lambda _: x_euler, None)
        return x_next, None

    x, _ = jax.lax.scan(body, x0, xs)
    return x


# ----------------------------------------------------------------------------
# DPM-Solver(++) 2M on TrigFlow time


def dpm_solver(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 20,
    use_pp: bool = True,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> jnp.ndarray:
    """2nd-order multistep DPM solver on t = atan(σ/σ_d) (reference :289-353)."""
    sigma_data = net.sigma_data

    ramp = np.linspace(0, 1, num_steps)
    sigmas = (
        sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    t_steps = np.concatenate([np.arctan(sigmas / sigma_data), [0.0]])

    s_arr = t_steps[:-1]
    t_arr = t_steps[1:]
    delta = s_arr - t_arr
    logtan = lambda u: np.log(np.tan(np.clip(u, 1e-4, 1.569)))
    denom = np.sin(s_arr) if use_pp else np.cos(s_arr)

    # 2M correction coefficient; zero on the 1st-order steps (k=0, last).
    coefs = np.zeros(num_steps)
    for k in range(1, num_steps - 1):
        r_s = (logtan(s_arr[k]) - logtan(s_arr[k - 1])) / (
            logtan(s_arr[k]) - logtan(t_arr[k])
        )
        c = np.sin(delta[k]) / (2 * r_s * max(denom[k], 1e-3))
        coefs[k] = c if use_pp else -c

    xs = {
        "s": jnp.asarray(s_arr, jnp.float32),
        "cos_dt": jnp.asarray(np.cos(delta), jnp.float32),
        "sin_dt": jnp.asarray(np.sin(delta), jnp.float32),
        "coef": jnp.asarray(coefs, jnp.float32),
        "cos_s": jnp.asarray(np.cos(s_arr), jnp.float32),
        "sin_s": jnp.asarray(np.sin(s_arr), jnp.float32),
    }

    x0 = latents.astype(jnp.float32) * sigma_data
    pred0 = jnp.zeros_like(x0)

    def body(carry, s):
        x_t, pred_prev = carry
        F_s = net(x_t / sigma_data, s["s"], condition, auxiliary).astype(jnp.float32)
        if use_pp:
            pred = s["cos_s"] * x_t - s["sin_s"] * sigma_data * F_s
        else:
            pred = s["sin_s"] * x_t + s["cos_s"] * sigma_data * F_s
        first_order = s["cos_dt"] * x_t - s["sin_dt"] * sigma_data * F_s
        x_next = first_order + s["coef"] * (pred_prev - pred)
        return (x_next, pred), None

    (x, _), _ = jax.lax.scan(body, (x0, pred0), xs)
    return x


def dpm_solver_2s(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 20,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    S_churn: float = 0.0,
    S_min: float = 0.0,
    S_max: float = 1.57,
    S_noise: float = 1.0,
) -> jnp.ndarray:
    """DPM-Solver++ 2S: per-step Heun on v-prediction (reference :355-415)."""
    sigma_data = net.sigma_data
    t_steps = np.concatenate(
        [_loguniform_t_steps(num_steps, sigma_min, sigma_max, sigma_data), [0.0]]
    )

    xs = {
        "s": jnp.asarray(t_steps[:-1], jnp.float32),
        "t": jnp.asarray(t_steps[1:], jnp.float32),
        "is_not_last": jnp.arange(num_steps) < num_steps - 1,
    }

    x0 = latents.astype(jnp.float32) * sigma_data

    def body(x_t, s):
        delta = s["t"] - s["s"]
        F_s = net(x_t / sigma_data, s["s"], condition, auxiliary).astype(jnp.float32)
        x_euler = x_t + delta * sigma_data * F_s

        def heun(_):
            F_t = net(x_euler / sigma_data, s["t"], condition, auxiliary).astype(
                jnp.float32
            )
            return x_t + delta * sigma_data * 0.5 * (F_s + F_t)

        x_next = jax.lax.cond(s["is_not_last"], heun, lambda _: x_euler, None)
        return x_next, None

    x, _ = jax.lax.scan(body, x0, xs)
    return x


# ----------------------------------------------------------------------------
# Consistency samplers


def _scm_t_steps(
    num_steps: int,
    sigma_min: float,
    sigma_max: float,
    sigma_data: float,
    intermediates: Optional[Sequence[float]],
) -> np.ndarray:
    if num_steps == 1:
        t_steps = np.array([np.pi / 2])
    else:
        t_steps = _loguniform_t_steps(num_steps, sigma_min, sigma_max, sigma_data)
    t_steps = np.concatenate([t_steps, [0.0]])
    if num_steps == 2 and intermediates is None:
        # sCM paper intermediate for the 2-step sampler (reference :446-447).
        t_steps = np.array([t_steps[0], 1.1, 0.0])
    elif intermediates:
        t_steps = np.concatenate([t_steps[:1], np.asarray(intermediates), t_steps[-1:]])
    return t_steps


def scm_solver(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 2,
    intermediates: Optional[Sequence[float]] = None,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
) -> jnp.ndarray:
    """Multistep consistency sampler (TrigFlow). 1 step: x = cos·x − sin·σ_d·F
    at t = π/2; multistep re-noises at each intermediate t (reference :417-461).
    """
    sigma_data = net.sigma_data
    t_steps = _scm_t_steps(num_steps, sigma_min, sigma_max, sigma_data, intermediates)
    n = len(t_steps) - 1

    x_t = latents.astype(jnp.float32) * sigma_data

    if n == 1:
        t = float(t_steps[0])
        F_t = net(x_t / sigma_data, jnp.float32(t), condition, auxiliary).astype(
            jnp.float32
        )
        return np.cos(t) * x_t - np.sin(t) * sigma_data * F_t

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    xs = {
        "t": jnp.asarray(t_steps[:-1], jnp.float32),
        "cos_t": jnp.asarray(np.cos(t_steps[:-1]), jnp.float32),
        "sin_t": jnp.asarray(np.sin(t_steps[:-1]), jnp.float32),
        "renoise": jnp.arange(n) > 0,
        "key": keys,
    }

    def body(x_t, s):
        noise = sigma_data * jax.random.normal(s["key"], x_t.shape)
        x_t = jnp.where(s["renoise"], s["sin_t"] * noise + s["cos_t"] * x_t, x_t)
        F_t = net(x_t / sigma_data, s["t"], condition, auxiliary).astype(jnp.float32)
        return s["cos_t"] * x_t - s["sin_t"] * sigma_data * F_t, None

    x, _ = jax.lax.scan(body, x_t, xs)
    return x


def scm_solve2(
    net: NetFn,
    latents: jnp.ndarray,
    condition: Optional[jnp.ndarray] = None,
    auxiliary=None,
    key: Optional[jax.Array] = None,
    num_steps: int = 2,
    intermediates: Optional[Sequence[float]] = None,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
) -> jnp.ndarray:
    """Few-step TrigFlow sampler, noise injected after each step (ref :463-512)."""
    sigma_data = net.sigma_data
    t_steps = _loguniform_t_steps(num_steps, sigma_min, sigma_max, sigma_data)
    t_steps = np.concatenate([t_steps, [0.0]])
    if num_steps == 2:
        t_steps = np.array([t_steps[0], 1.1, 0.0])
    elif intermediates and num_steps > 2:
        t_steps = np.concatenate([t_steps[:1], np.asarray(intermediates), t_steps[-1:]])
    n = len(t_steps) - 1

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    xs = {
        "s": jnp.asarray(t_steps[:-1], jnp.float32),
        "cos_s": jnp.asarray(np.cos(t_steps[:-1]), jnp.float32),
        "sin_s": jnp.asarray(np.sin(t_steps[:-1]), jnp.float32),
        "cos_t": jnp.asarray(np.cos(t_steps[1:]), jnp.float32),
        "sin_t": jnp.asarray(np.sin(t_steps[1:]), jnp.float32),
        "key": keys,
    }
    multi = n > 1
    x0 = latents.astype(jnp.float32) * sigma_data

    def body(x_t, s):
        F_s = net(x_t / sigma_data, s["s"], condition, auxiliary).astype(jnp.float32)
        x_t = s["cos_s"] * x_t - s["sin_s"] * sigma_data * F_s
        if multi:
            noise = sigma_data * jax.random.normal(s["key"], x_t.shape)
            x_t = s["cos_t"] * x_t + s["sin_t"] * noise
        return x_t, None

    x, _ = jax.lax.scan(body, x0, xs)
    return x
