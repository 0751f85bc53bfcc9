"""Linearize-once sCM step: share the primal between tangent and gradient.

The standard sCM step (SCMLoss.__call__ under ``jax.value_and_grad``) costs
~6x a forward pass: the jvp runs primal+tangent (2x), the differentiable
main path runs the primal again (1x), and the remat'd backward replays it
once more plus ~2x of gradient math. The primal inside the jvp and the main
path compute the SAME function at the SAME point — one of them is pure
duplication, kept only because ``jax.jvp`` and ``jax.vjp`` build separate
traces (reference loss.py:212-231 has the same duplication: a no-grad
functorch jvp plus a DDP forward).

``jax.linearize`` removes it: linearize f(params, x, t) ONCE, evaluate the
linear tangent map at (0, v_x, v_t) for dF, and ``jax.linear_transpose``
the SAME linear map for the parameter gradient. The zero parameter tangent
is a ``jnp.zeros_like`` broadcast, which XLA's algebraic simplifier folds
out of the tangent pass, so the tangent costs only the (x, t) part.

Flop accounting caveat: WITHOUT remat this is 5x a forward (primal 1x +
tangent 1x + transpose ~3x... minus the saved duplicate primal), but the
flagship needs remat (46 GB of activations otherwise), and under
``jax.checkpoint`` BOTH the tangent evaluation and the transpose replay the
primal per layer pair — nominally 6x, the same as the production step. The
model's scan remat uses ``prevent_cse=False`` (swinv2.py:792), so XLA MAY
CSE the tangent's replay with the primal pass where memory allows; whether
that nets out ahead of the production step's faster pallas kernels is what
scripts/probe_linearize_step.py measures.

Constraint: every op on the path needs BOTH a jvp rule and a transpose rule
for its tangent. The pallas kernels have either custom_jvp (tangent = an
opaque pallas call — not transposable) or custom_vjp (not forward-mode
differentiable), so this path runs the model with ``use_pallas=False``
(pure jnp) and lets XLA fuse primal/tangent/transpose. Whether the shared
primal beats the pallas kernels' higher per-pass speed is an empirical
question per grid size — see scripts/probe_linearize_step.py and PERF.md.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from swift_tpu.training.loss import SCMLoss, _has_logvar


def scm_linearized_value_and_grad(loss: SCMLoss) -> Callable:
    """Build a ``(params, key, x, step, condition, auxiliary) -> (loss,
    grads)`` function computing the sCM loss and its parameter gradient via
    one shared linearization.

    Matches ``jax.value_and_grad(loss.__call__)`` (same math, same
    randomness; tests/test_losses.py pins the equivalence). Distillation
    teachers are supported through ``loss._dxt_dt`` exactly as in the
    standard path.

    The model is forced to the pure-jnp path here: the pallas kernels carry
    either a custom_jvp (tangent not transposable) or a custom_vjp (not
    forward-mode differentiable), so a pallas-routed model would fail at
    trace inside ``jax.linearize`` (r4 advisor). A ``use_pallas`` auto/True
    model is cloned with ``use_pallas=False``; callers keep their original
    loss untouched.
    """
    model = getattr(loss.precond, "model", None)
    if model is not None and getattr(model, "use_pallas", False) is not False:
        # None means auto (pallas on TPU) — force off unconditionally so the
        # traced program is backend-independent.
        loss = dataclasses.replace(
            loss,
            precond=dataclasses.replace(
                loss.precond, model=model.clone(use_pallas=False)
            ),
        )
    sd = loss.sigma_data
    use_logvar = _has_logvar(loss.precond)

    def value_and_grad(params, key, x, step, condition=None, auxiliary=None,
                       teacher=None):
        t, z = loss._draw(key, x)
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        x_t = cos_t * x + sin_t * z
        dxt_dt = loss._dxt_dt(t, z, x, x_t, condition, auxiliary, teacher)
        xi = x_t / sd

        def f(p, a, b):
            out = loss.precond.apply(
                p, a, b, condition, auxiliary, return_logvar=use_logvar,
            )
            if isinstance(out, tuple):
                F, lv = out
                return F, lv.reshape(-1, 1, 1, 1)
            return out, jnp.zeros((x.shape[0], 1, 1, 1))

        # ONE linearization: primal + residuals shared by tangent and vjp.
        (F_x, logvar), lin = jax.linearize(f, params, xi, t)

        v_x = cos_t * sin_t * dxt_dt / sd
        v_t = cos_t * sin_t
        zero_p = jax.tree_util.tree_map(jnp.zeros_like, params)
        dF_x, _ = lin(zero_p, v_x, v_t)

        if loss.tangent_warmup_kimg > 0:
            r = jnp.minimum(1.0, step / (loss.tangent_warmup_kimg * 1000))
        else:
            r = 1.0

        # F_x/dF_x are VALUES here (manual-grad land) — the stop_gradients
        # of the standard path are implicit.
        g = -(cos_t**2) * (sd * F_x - dxt_dt) - r * (
            (cos_t * sin_t) * x_t + sd * dF_x
        )
        gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2, 3), keepdims=True))
        gn = gn * np.sqrt(1.0 / (g.shape[1] * g.shape[2] * g.shape[3]))
        g = g / (gn + 0.1)

        # scalar loss as a function of the net outputs only; its gradient is
        # the output cotangent for the transpose.
        def h(Fv, lvv):
            se = loss.w_var * loss.w_lat * jnp.square(
                Fv - jax.lax.stop_gradient(F_x) - g
            )
            return ((1.0 / jnp.exp(lvv)) * se + lvv).sum(axis=-1).mean()

        lval, (w_F, w_lv) = jax.value_and_grad(h, argnums=(0, 1))(F_x, logvar)

        transpose = jax.linear_transpose(lin, params, xi, t)
        grads, _, _ = transpose((w_F, w_lv))
        return lval, grads

    return value_and_grad
