"""Fused residual+LayerNorm+AdaLN epilogue vs the jnp reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_modnorm as pm

B, N, D = 3, 64, 48


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pm.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    y = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    r = jax.random.normal(ks[1], (B, N, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[2], (D,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    msc = 0.2 * jax.random.normal(ks[4], (B, D), jnp.float32)
    msh = 0.2 * jax.random.normal(ks[5], (B, D), jnp.float32)
    return y, r, g, b, msc, msh


def test_forward_matches_reference():
    args = _inputs()
    out_p = pm.fused_modnorm_residual(*args)
    out_r = pm.reference_modnorm_residual(*args)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=1e-6, atol=1e-6
    )


def test_backward_matches_reference():
    args = _inputs(1)

    def lp(*a):
        return jnp.sum(pm.fused_modnorm_residual(*a) ** 2)

    def lr(*a):
        return jnp.sum(pm.reference_modnorm_residual(*a) ** 2)

    gp = jax.grad(lp, argnums=tuple(range(6)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(6)))(*args)
    for a, b_, name in zip(gp, gr, ["dy", "dr", "dg", "db", "dmsc", "dmsh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5,
            err_msg=f"mismatch in {name}",
        )


def test_matches_flax_layernorm_semantics():
    """The manual LN (fp32 stats, affine, AdaLN, residual) reproduces the
    round-1 composition: nn.LayerNorm -> *(1+scale)+shift -> +residual."""
    from flax import linen as nn

    y, r, g, b, msc, msh = _inputs(2)
    ln = nn.LayerNorm(epsilon=1e-6)
    out_flax = ln.apply(
        {"params": {"scale": g, "bias": b}}, y
    ) * (1 + msc[:, None, :]) + msh[:, None, :] + r
    out_ref = pm.reference_modnorm_residual(y, r, g, b, msc, msh, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_flax), rtol=1e-5, atol=1e-5
    )


def test_untileable_raises():
    y, r, g, b, msc, msh = _inputs(3)
    with pytest.raises(ValueError):
        pm.fused_modnorm_residual(y[:, :7], r[:, :7], g, b, msc, msh)


def test_sharded_matches():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    y, r, g, b, msc, msh = _inputs(4)
    # B=3 doesn't divide 4; build batch 8
    y = jnp.tile(y, (4, 1, 1))[:8]
    r = jnp.tile(r, (4, 1, 1))[:8]
    msc = jnp.tile(msc, (4, 1))[:8]
    msh = jnp.tile(msh, (4, 1))[:8]
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    out_plain = pm.fused_modnorm_residual(y, r, g, b, msc, msh)
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    out_tp = jax.jit(
        lambda yy, rr: pm.sharded_modnorm_residual(
            yy, rr, g, b, msc, msh, mesh=mesh, data_axis="data"
        )
    )(ys, r)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_plain), rtol=1e-6, atol=1e-6
    )


def test_fused_matmul_modnorm_residual_matches():
    """wo-matmul + modnorm + residual epilogue == the composition."""
    ks = jax.random.split(jax.random.PRNGKey(6), 7)
    B, N, F, D = 2, 64, 40, 48
    x = jax.random.normal(ks[0], (B, N, F), jnp.float32)
    w = 0.1 * jax.random.normal(ks[1], (F, D), jnp.float32)
    r = jax.random.normal(ks[2], (B, N, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    msc = 0.2 * jax.random.normal(ks[5], (B, D), jnp.float32)
    msh = 0.2 * jax.random.normal(ks[6], (B, D), jnp.float32)

    out = pm.fused_matmul_modnorm_residual(x, w, r, g, b, msc, msh)
    exp = pm.reference_modnorm_residual(jnp.dot(x, w), r, g, b, msc, msh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)

    def lp(*a):
        return jnp.sum(pm.fused_matmul_modnorm_residual(*a) ** 2)

    def lr(x, w, r, g, b, msc, msh):
        return jnp.sum(
            pm.reference_modnorm_residual(jnp.dot(x, w), r, g, b, msc,
                                          msh) ** 2)

    gp = jax.grad(lp, argnums=tuple(range(7)))(x, w, r, g, b, msc, msh)
    gr = jax.grad(lr, argnums=tuple(range(7)))(x, w, r, g, b, msc, msh)
    for a, e in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4)


def test_fused_matmul_modnorm_residual_int8_matches_mirror():
    """int8 wo+modnorm epilogue kernel == the jnp mirror (identical
    quantization points: per-token x, per-column w), and both land within
    dynamic-int8 error of the fp composition."""
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    B, N, F, D = 2, 64, 40, 48
    x = jax.random.normal(ks[0], (B, N, F), jnp.float32)
    w = 0.1 * jax.random.normal(ks[1], (F, D), jnp.float32)
    r = jax.random.normal(ks[2], (B, N, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    msc = 0.2 * jax.random.normal(ks[5], (B, D), jnp.float32)
    msh = 0.2 * jax.random.normal(ks[6], (B, D), jnp.float32)

    out = pm.fused_matmul_modnorm_residual_int8(x, w, r, g, b, msc, msh)
    mirror = pm.reference_matmul_modnorm_residual_int8(
        x, w, r, g, b, msc, msh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mirror),
                               rtol=1e-4, atol=1e-4)
    fp = pm.reference_modnorm_residual(jnp.dot(x, w), r, g, b, msc, msh)
    rel = np.linalg.norm(np.asarray(out) - np.asarray(fp)) / np.linalg.norm(
        np.asarray(fp))
    assert rel < 0.02, f"int8 epilogue deviates {rel:.4f} rel from fp"


def test_jvp_variant_matches_reference():
    """jax.jvp through the jvp-capable entry: tangents flow through y,
    residual AND the AdaLN scale/shift rows (Dense(t) under the sCM jvp);
    g/b are params (zero tangent by the entry's contract)."""
    y, r, g, b, msc, msh = _inputs(2)
    ks = jax.random.split(jax.random.PRNGKey(17), 4)
    dy = jax.random.normal(ks[0], y.shape, y.dtype)
    dr = jax.random.normal(ks[1], r.shape, r.dtype)
    dmsc = 0.1 * jax.random.normal(ks[2], msc.shape, msc.dtype)
    dmsh = 0.1 * jax.random.normal(ks[3], msh.shape, msh.dtype)

    op, dop = jax.jvp(
        lambda y, r, msc, msh: pm.fused_modnorm_residual(
            y, r, g, b, msc, msh, jvp=True
        ),
        (y, r, msc, msh), (dy, dr, dmsc, dmsh),
    )
    orf, dorf = jax.jvp(
        lambda y, r, msc, msh: pm.reference_modnorm_residual(
            y, r, g, b, msc, msh
        ),
        (y, r, msc, msh), (dy, dr, dmsc, dmsh),
    )
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dorf),
                               rtol=1e-5, atol=1e-5)
