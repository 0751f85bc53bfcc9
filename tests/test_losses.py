"""Loss tests: weights, noise samplers, golden formulas, grad/jvp paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from swift_tpu.models.precond import EDMPrecond, PassPrecond
from swift_tpu.training.loss import (
    CRPSLoss,
    EDMLoss,
    MSELoss,
    SCMLoss,
    TrigFlowLoss,
    kernel_crps,
    latitude_weights,
    lognormal,
    loguniform,
    variable_weights,
)

VARS = ("2m_temperature", "geopotential_500", "temperature_850")
H, W, C = 8, 16, 3


class TinyNet(nn.Module):
    """Linear-ish differentiable toy backbone honoring the model contract."""

    out_channels: int = C
    logvar: bool = False

    @nn.compact
    def __call__(self, x, t, auxiliary=None, jvp=False, return_logvar=False):
        w = self.param("w", nn.initializers.normal(0.1), (x.shape[-1], self.out_channels))
        out = x @ w + 0.1 * jnp.sin(t).reshape(-1, 1, 1, 1)
        if self.logvar:
            lv = self.param("lv", nn.initializers.zeros_init(), (1,))
            if return_logvar:
                return out, jnp.broadcast_to(lv, (x.shape[0],))
        return out


def make_precond(kind="pass", cond_ch=C, logvar=False, sigma_data=1.0):
    cls = {"pass": PassPrecond, "edm": EDMPrecond}[kind]
    return cls(
        model=TinyNet(out_channels=C, logvar=logvar),
        img_resolution=(H, W),
        img_channels=C,
        condition_channels=cond_ch,
        sigma_data=sigma_data,
    )


def test_latitude_weights():
    w = latitude_weights(32)
    assert w.shape == (1, 32, 1, 1)
    assert w.min() >= 0.1
    # poles are clamped, equator is heaviest
    assert w[0, 16, 0, 0] > w[0, 0, 0, 0]


def test_variable_weights():
    w = variable_weights(list(VARS))
    assert w.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # geopotential_500 weight ratio vs temperature_850 = 500/850
    np.testing.assert_allclose(w[0, 0, 0, 1] / w[0, 0, 0, 2], 500 / 850, rtol=1e-5)


def test_noise_samplers_ranges():
    k = jax.random.PRNGKey(0)
    s = loguniform(k, 512, 0.02, 200.0)
    assert s.shape == (512, 1, 1, 1)
    assert (s >= 0.02).all() and (s <= 200.0).all()
    ln = lognormal(k, 2048, -0.2, 2.2)
    med = float(jnp.median(jnp.log(ln)))
    assert abs(med + 0.2) < 0.25  # median of log is P_mean


def _batch(key):
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (2, H, W, C))
    cond = jax.random.normal(kc, (2, H, W, C))
    return x, cond


@pytest.mark.parametrize("logvar", [False, True])
def test_trigflow_loss_grad(logvar):
    p = make_precond(logvar=logvar)
    params = p.init(jax.random.PRNGKey(0))
    loss = TrigFlowLoss(
        precond=p, lat_dim=H, variables=VARS,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    x, cond = _batch(jax.random.PRNGKey(1))
    val, grads = jax.value_and_grad(loss)(params, jax.random.PRNGKey(2), x, cond)
    assert jnp.isfinite(val)
    assert all(jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(grads))


def test_edm_loss_value():
    p = make_precond("edm", sigma_data=0.5)
    params = p.init(jax.random.PRNGKey(0))
    loss = EDMLoss(
        precond=p, lat_dim=H, variables=VARS,
        noise={"dist": "lognormal", "P_mean": -0.2, "P_std": 2.2},
        sigma_data=0.5,
    )
    x, cond = _batch(jax.random.PRNGKey(1))
    val = loss(params, jax.random.PRNGKey(2), x, cond)
    assert jnp.isfinite(val) and val > 0


def test_scm_loss_grad_and_warmup():
    p = make_precond(logvar=True)
    params = p.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=p, lat_dim=H, variables=VARS,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=3,
    )
    x, cond = _batch(jax.random.PRNGKey(1))
    f = jax.jit(jax.value_and_grad(loss), static_argnames=())
    v0, g0 = f(params, jax.random.PRNGKey(2), x, jnp.float32(0.0), cond)
    v1, g1 = f(params, jax.random.PRNGKey(2), x, jnp.float32(10_000.0), cond)
    assert jnp.isfinite(v0) and jnp.isfinite(v1)
    # warmup changes the target → different loss values
    assert not np.isclose(float(v0), float(v1))
    assert all(jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(g1))


def test_scm_distillation_uses_teacher():
    p = make_precond(logvar=False)
    params = p.init(jax.random.PRNGKey(0))
    loss_d = SCMLoss(
        precond=p, lat_dim=H, variables=VARS,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        distillation=True,
    )
    x, cond = _batch(jax.random.PRNGKey(1))
    teacher_calls = []

    def teacher(xi, ti, c, a):
        teacher_calls.append(1)
        return jnp.zeros_like(xi)

    v = loss_d(params, jax.random.PRNGKey(2), x, jnp.float32(0.0), cond, teacher=teacher)
    assert teacher_calls, "teacher was not consulted"
    assert jnp.isfinite(v)


def test_kernel_crps_golden():
    """CRPS of a 2-member ensemble: |m1-y|/2+|m2-y|/2 - (1-eps)*|m1-m2|/(2*2*1)*2."""
    preds = jnp.array([[1.0, 3.0]])  # (1, m=2)
    y = jnp.array([2.0])
    out = kernel_crps(preds, y, alpha=1.0)
    # skill = (1+1)/2 = 1; spread = (|1-3|+|3-1|)/(2*2*1) = 1; crps = 1-1 = 0
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    out_af = kernel_crps(preds, y, alpha=0.95)
    # epsilon = 0.05/2; crps = 1 - (1-0.025)*1 = 0.025
    np.testing.assert_allclose(np.asarray(out_af), 0.025, atol=1e-6)


def _std_fns():
    mean = np.zeros((1, 1, C), np.float32)
    std = 2.0 * np.ones((1, 1, C), np.float32)

    def unstd_t(v, delta=6):
        return v * std

    def unstd_x(v, delta=6):
        return v * std + mean

    def std_x(v, delta=6):
        return (v - mean) / std

    return unstd_t, unstd_x, std_x


def test_mse_multistep():
    p = make_precond()
    params = p.init(jax.random.PRNGKey(0))
    loss = MSELoss(
        precond=p, lat_dim=H, variables=VARS,
        std_fns=_std_fns(), n_variables=C,
    )
    x, cond = _batch(jax.random.PRNGKey(1))
    for steps in (1, 3):
        v, g = jax.value_and_grad(loss)(
            params, jax.random.PRNGKey(2), x, cond, steps=steps
        )
        assert jnp.isfinite(v)
        assert all(jnp.isfinite(l).all() for l in jax.tree_util.tree_leaves(g))


def test_crps_multistep():
    F = 1
    p = make_precond(cond_ch=C + F)
    params = p.init(jax.random.PRNGKey(0))
    loss = CRPSLoss(
        precond=p, lat_dim=H, variables=VARS,
        std_fns=_std_fns(), n_variables=C, ensemble_size=2,
    )
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, H, W, C))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (2, H, W, C + F))
    steps = 3
    forcings = jax.random.normal(jax.random.fold_in(key, 2), (2, steps, H, W, F))
    fn = jax.jit(
        jax.value_and_grad(loss), static_argnames=("steps", "delta")
    )
    v, g = fn(params, jax.random.PRNGKey(3), x, cond, jnp.full((2, 1), 0.6),
              forcings, delta=6, steps=steps)
    assert jnp.isfinite(v)
    assert all(jnp.isfinite(l).all() for l in jax.tree_util.tree_leaves(g))


def test_scm_staged_jvp_matches_monolithic():
    """SCMLoss.jvp_term + dF_x= (the two-program 0.25° memory path) must
    reproduce the monolithic loss exactly — values AND parameter grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import SCMLoss

    H, W, C = 8, 16, 3
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=24, heads=3, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, use_pallas=False,
    )
    pre = PassPrecond(model=model, img_resolution=(H, W), img_channels=C,
                      condition_channels=C, auxiliary_dim=1, sigma_data=1.0)
    params = pre.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=pre, lat_dim=H,
        variables=("2m_temperature", "geopotential_500", "temperature_850"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, C))
    aux = jnp.full((2, 1), 0.6)
    key = jax.random.PRNGKey(3)

    def mono(p):
        return loss(p, key, x, step=100.0, condition=cond, auxiliary=aux)

    def staged(p):
        dF = loss.jvp_term(p, key, x, condition=cond, auxiliary=aux)
        return loss(p, key, x, step=100.0, condition=cond, auxiliary=aux,
                    dF_x=dF)

    v0, g0 = jax.value_and_grad(mono)(params)
    v1, g1 = jax.value_and_grad(staged)(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_scm_linearized_matches_value_and_grad():
    """scm_linearized_value_and_grad (the shared-primal 5x-fwd step) must
    reproduce jax.value_and_grad(SCMLoss) — values AND parameter grads —
    on the real model path (SwinV2 with scan+remat, logvar head)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.linearized import scm_linearized_value_and_grad
    from swift_tpu.training.loss import SCMLoss

    H, W, C = 8, 16, 3
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=24, heads=3, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, use_pallas=False,
    )
    pre = PassPrecond(model=model, img_resolution=(H, W), img_channels=C,
                      condition_channels=C, auxiliary_dim=1, sigma_data=1.0)
    params = pre.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=pre, lat_dim=H,
        variables=("2m_temperature", "geopotential_500", "temperature_850"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, C))
    aux = jnp.full((2, 1), 0.6)
    key = jax.random.PRNGKey(3)

    def mono(p):
        return loss(p, key, x, step=100.0, condition=cond, auxiliary=aux)

    v0, g0 = jax.jit(jax.value_and_grad(mono))(params)
    lin_vg = jax.jit(
        lambda p: scm_linearized_value_and_grad(loss)(
            p, key, x, jnp.float32(100.0), cond, aux
        )
    )
    v1, g1 = lin_vg(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
