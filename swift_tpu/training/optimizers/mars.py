"""MARS — variance-reduced optimizer (mars-adamw / mars-lion / mars-shampoo).

Behavioral parity with the reference (src/swift/training/optimizers/mars.py,
itself adapted from AGI-Arena/MARS, arXiv 2411.10438), approximate variant
(``is_approx=True``, last_grad = previous step's grad, reference :301-302):

  * gradient correction ``c_t = grad + γ·(β1/(1−β1))·(grad − last_grad)``
    clipped to unit norm (:39-42);
  * mars-adamw: bias-corrected Adam moments on c_t (:44-65);
  * mars-lion: sign update on the momentum (:66-67);
  * mars-shampoo: Newton-Schulz orthogonalization of the momentum for 2-D
    grads (:68-75);
  * non-2-D parameters fall back to plain AdamW with ``lr_1d``/``betas_1d``
    (:77-103) unless ``optimize_1d``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from swift_tpu.training.optimizers.muon import newton_schulz


class MarsState(NamedTuple):
    exp_avg: Any
    exp_avg_sq: Any
    last_grad: Any
    count: jnp.ndarray


def mars(
    learning_rate: optax.ScalarOrSchedule = 3e-3,
    betas: tuple[float, float] = (0.95, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    gamma: float = 0.025,
    mars_type: str = "mars-adamw",
    optimize_1d: bool = False,
    lr_1d: float = 3e-3,
    betas_1d: tuple[float, float] = (0.9, 0.95),
    weight_decay_1d: float = 0.1,
) -> optax.GradientTransformation:
    assert mars_type in ("mars-adamw", "mars-lion", "mars-shampoo")
    b1, b2 = betas
    b1_1d, b2_1d = betas_1d

    def base_lr(count):
        if callable(learning_rate):
            return learning_rate(count)
        return learning_rate

    lr_1d_factor = lr_1d / (learning_rate if not callable(learning_rate) else 1.0)

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return MarsState(zeros(), zeros(), zeros(), jnp.zeros((), jnp.int32))

    def _mars_update(g, last_g, m, v, step, is_2d):
        c_t = g + gamma * (b1 / (1 - b1)) * (g - last_g)
        norm = jnp.sqrt(jnp.sum(c_t.astype(jnp.float32) ** 2))
        c_t = jnp.where(norm > 1.0, c_t / norm, c_t)
        m_new = b1 * m + (1 - b1) * c_t
        if mars_type == "mars-adamw" or (mars_type == "mars-shampoo" and not is_2d):
            v_new = b2 * v + (1 - b2) * c_t * c_t
            bc1 = 1 - b1 ** step
            bc2 = 1 - b2 ** step
            denom = (jnp.sqrt(v_new) / jnp.sqrt(bc2) + eps) * bc1
            upd = m_new / denom
        elif mars_type == "mars-lion":
            v_new = v
            upd = jnp.sign(m_new)
        else:  # mars-shampoo on 2-D
            v_new = v
            factor = max(1.0, g.shape[0] / g.shape[1]) ** 0.5
            upd = newton_schulz(m_new * (1.0 / (1 - b1))).astype(jnp.float32) * factor
        return upd, m_new, v_new

    def _adamw_1d_update(g, m, v, step):
        m_new = b1_1d * m + (1 - b1_1d) * g
        v_new = b2_1d * v + (1 - b2_1d) * g * g
        bc1 = 1 - b1_1d ** step
        bc2 = 1 - b2_1d ** step
        denom = (jnp.sqrt(v_new) / jnp.sqrt(bc2) + eps) * bc1
        return lr_1d_factor * (m_new / denom), m_new, v_new

    def update_fn(updates, state, params=None):
        assert params is not None, "mars requires params (weight decay)"
        count = state.count + 1
        step = count.astype(jnp.float32)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_lg = treedef.flatten_up_to(state.last_grad)
        flat_p = treedef.flatten_up_to(params)

        out_u, out_m, out_v = [], [], []
        for g, m, v, lg, p in zip(flat_u, flat_m, flat_v, flat_lg, flat_p):
            is_2d = g.ndim == 2
            if optimize_1d or is_2d:
                upd, m_new, v_new = _mars_update(g, lg, m, v, step, is_2d)
                wd = weight_decay
            else:
                upd, m_new, v_new = _adamw_1d_update(g, m, v, step)
                wd = weight_decay if optimize_1d else weight_decay_1d
            # decoupled weight decay folded into the update (reference :65).
            out_u.append(-(upd + wd * p))
            out_m.append(m_new)
            out_v.append(v_new)

        lr = base_lr(state.count)
        new_updates = jax.tree_util.tree_map(
            lambda u: lr * u, treedef.unflatten(out_u)
        )
        new_state = MarsState(
            treedef.unflatten(out_m),
            treedef.unflatten(out_v),
            updates,  # approx variant: last_grad <- current grad
            count,
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
