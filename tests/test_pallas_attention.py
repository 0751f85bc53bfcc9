"""Pallas fused window attention vs the jnp reference implementation.

On CPU these run the Pallas kernels in interpreter mode; on TPU the real
kernels compile. Forward and backward (custom_vjp) are both checked.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_attention as pa

BW, H, N, D = 4, 2, 32, 16


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force pallas interpreter mode off-TPU."""
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pa.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (BW, H, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (BW, H, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (BW, H, N, D), jnp.float32)
    scale = jnp.exp(jax.random.normal(ks[3], (H,)) * 0.1 + 1.0)
    return q, k, v, scale


def test_forward_matches_reference():
    q, k, v, scale = _inputs()
    out_p = pa.fused_window_attention(q, k, v, scale)
    out_r = pa.reference_window_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=2e-2, atol=2e-2
    )


def test_backward_matches_reference():
    q, k, v, scale = _inputs(1)

    def loss_p(q, k, v, s):
        return jnp.sum(pa.fused_window_attention(q, k, v, s) ** 2)

    def loss_r(q, k, v, s):
        return jnp.sum(pa.reference_window_attention(q, k, v, s).astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, scale)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, scale)
    for a, b, name in zip(gp, gr, ["dq", "dk", "dv", "dscale"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=6e-2, atol=6e-2,
            err_msg=f"mismatch in {name}",
        )


def test_jvp_variant_matches_reference():
    """jax.jvp through the jvp-capable fused path == jvp through the jnp
    reference (the sCM tangent computation)."""
    q, k, v, scale = _inputs(2)
    tq, tk, tv = (jax.random.normal(jax.random.PRNGKey(9 + i), q.shape)
                  for i in range(3))

    def f_pallas(q, k, v):
        return pa.fused_window_attention(q, k, v, scale, jvp=True)

    def f_ref(q, k, v):
        return pa.reference_window_attention(q, k, v, scale)

    op, dop = jax.jvp(f_pallas, (q, k, v), (tq, tk, tv))
    orf, dorf = jax.jvp(f_ref, (q, k, v), (tq, tk, tv))
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dorf), rtol=5e-2, atol=5e-2)


def test_scm_loss_grad_with_pallas_model():
    """value_and_grad of the sCM loss through a pallas-enabled model: the
    outer grad flows through the custom_vjp path while the inner jax.jvp
    (stop-gradient'ed) uses the custom_jvp path."""
    import jax.numpy as jnp

    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import SCMLoss

    Hh, Ww, C = 8, 16, 3
    model = SwinV2(
        img_resolution=(Hh, Ww), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, logvar=True, dtype=jnp.float32,
        use_pallas=True,
    )
    p = PassPrecond(model=model, img_resolution=(Hh, Ww), img_channels=C,
                    condition_channels=C, sigma_data=1.0)
    params = p.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=p, lat_dim=Hh,
        variables=("2m_temperature", "geopotential_500", "temperature_850"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, Hh, Ww, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, Hh, Ww, C))
    val, grads = jax.value_and_grad(loss)(
        params, jax.random.PRNGKey(3), x, jnp.float32(0.0), cond
    )
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_swinv2_pallas_flag_consistency():
    """SwinV2 outputs with use_pallas (interpreted) vs jnp path agree."""
    from swift_tpu.models.swinv2 import SwinV2

    kw = dict(
        img_resolution=(8, 16), in_channels=4, out_channels=2,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 4))
    t = jnp.array([0.5])
    m_ref = SwinV2(use_pallas=False, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
    # non-zero head so outputs are informative
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )
    y_ref = m_ref.apply({"params": params}, x, t)
    m_pal = SwinV2(use_pallas=True, **kw)
    y_pal = m_pal.apply({"params": params}, x, t)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-2, atol=2e-2
    )


def test_shard_mapped_kernel_matches_unsharded():
    """TP composition: the kernel shard_map'd over a (data, model) mesh —
    batch·window over data, heads over model — matches the plain call."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v, scale = _inputs(3)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    out_plain = pa.fused_window_attention(q, k, v, scale)

    qs = jax.device_put(q, NamedSharding(mesh, P("data", "model")))
    ks = jax.device_put(k, NamedSharding(mesh, P("data", "model")))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", "model")))
    out_tp = jax.jit(
        lambda a, b, c: pa.fused_window_attention(
            a, b, c, scale, mesh=mesh, data_axis="data", model_axis="model"
        )
    )(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_plain), rtol=2e-2, atol=2e-2
    )


def test_shard_mapped_kernel_jvp_matches():
    """Forward-mode AD through the shard_map'd jvp-capable kernel (the sCM
    tangent under TP)."""
    from jax.sharding import Mesh, PartitionSpec as P  # noqa: F401

    q, k, v, scale = _inputs(4)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    tq, tk, tv = (jax.random.normal(jax.random.PRNGKey(20 + i), q.shape)
                  for i in range(3))

    def f_tp(q, k, v):
        return pa.fused_window_attention(
            q, k, v, scale, jvp=True, mesh=mesh,
            data_axis="data", model_axis="model",
        )

    def f_ref(q, k, v):
        return pa.reference_window_attention(q, k, v, scale)

    op, dop = jax.jvp(f_tp, (q, k, v), (tq, tk, tv))
    orf, dorf = jax.jvp(f_ref, (q, k, v), (tq, tk, tv))
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dorf), rtol=2e-2, atol=2e-2)


def test_scm_value_and_grad_through_pallas_jvp():
    """The full sCM loss (jax.jvp inside value_and_grad) traces and
    differentiates with the pallas path on — the tangent kernel has no AD
    rules, so this guards the stop_gradient structure that keeps it off
    the reverse path (loss.py:259-260)."""
    import jax.numpy as jnp
    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import SCMLoss

    Hh, Ww, C = 8, 16, 3
    model = SwinV2(
        img_resolution=(Hh, Ww), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, use_pallas=True,
    )
    p = PassPrecond(model=model, img_resolution=(Hh, Ww), img_channels=C,
                    condition_channels=C, auxiliary_dim=1, sigma_data=1.0)
    params = p.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=p, lat_dim=Hh,
        variables=("2m_temperature", "geopotential_500", "temperature_850"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, Hh, Ww, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, Hh, Ww, C))

    def f(params):
        return loss(params, jax.random.PRNGKey(3), x, step=100.0,
                    condition=cond, auxiliary=jnp.full((2, 1), 0.6))

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    gn = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    )
    assert np.isfinite(gn) and gn > 0

    # and it must match the jnp path numerically
    model_ref = model.clone(use_pallas=False)
    p_ref = PassPrecond(model=model_ref, img_resolution=(Hh, Ww),
                        img_channels=C, condition_channels=C,
                        auxiliary_dim=1, sigma_data=1.0)
    loss_ref = SCMLoss(
        precond=p_ref, lat_dim=Hh, variables=loss.variables,
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )

    def f_ref(params):
        return loss_ref(params, jax.random.PRNGKey(3), x, step=100.0,
                        condition=cond, auxiliary=jnp.full((2, 1), 0.6))

    val_ref, grads_ref = jax.value_and_grad(f_ref)(params)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)
