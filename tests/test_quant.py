"""int8 inference path (PERF.md lever (e), r3 VERDICT #7): numerics of the
dynamic-quant helpers, kernel-vs-mirror parity (interpret mode on CPU), and
the FORECAST-level accuracy gate — the condition under which the flag may
ever become a config of record."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_ffn as pf
from swift_tpu.ops import quant


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pf.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def test_int8_matmul_close_to_fp():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (64, 96))
    w = jax.random.normal(k2, (96, 128)) * 0.05
    got = quant.int8_matmul(x, w)
    ref = x @ w
    # dynamic symmetric int8: relative error ~ 1/127 per factor
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 0.02, err


def test_int8_matmul_quantization_exact_points():
    # values already on the quant grid come back exactly
    w = jnp.eye(8, dtype=jnp.float32)
    x = jnp.array([[127.0, -127.0, 0.0, 64.0, 1.0, -1.0, 32.0, -8.0]])
    got = quant.int8_matmul(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_int8_ffn_kernel_matches_mirror():
    T, D, H = 256, 64, 160
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (T, D), jnp.float32)
    w1 = (jax.random.normal(ks[1], (D, 2 * H)) * 0.05).astype(jnp.float32)
    w2 = (jax.random.normal(ks[2], (H, D)) * 0.05).astype(jnp.float32)
    out_k = pf.fused_swiglu_ffn_int8(x, w1, w2)
    out_m = pf.reference_swiglu_ffn_int8(x, w1, w2)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_m),
                               rtol=1e-4, atol=1e-4)


def test_int8_ffn_close_to_fp():
    T, D, H = 256, 64, 160
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (T, D), jnp.float32)
    w1 = (jax.random.normal(ks[1], (D, 2 * H)) * 0.05).astype(jnp.float32)
    w2 = (jax.random.normal(ks[2], (H, D)) * 0.05).astype(jnp.float32)
    got = np.asarray(pf.reference_swiglu_ffn_int8(x, w1, w2))
    ref = np.asarray(pf.reference_swiglu_ffn(x, w1, w2))
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 0.03, err


def _tiny_model(quant_mode):
    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2

    H, W, C, F = 8, 16, 3, 1
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C + F, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, auxiliary_dim=1, dtype=jnp.float32,
        use_pallas=False, quant=quant_mode,
    )
    return PassPrecond(
        model=model, img_resolution=(H, W), img_channels=C,
        condition_channels=C + F, auxiliary_dim=1, sigma_data=1.0,
    ), (H, W, C, F)


def _randomize_zero_leaves(params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        0.05 * jax.random.normal(jax.random.PRNGKey(500 + i), a.shape, a.dtype)
        if not np.any(np.asarray(a)) else a
        for i, a in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_forecast_accuracy_gate():
    """The acceptance criterion for the flag: one-step sCM forecasts from
    the SAME weights and latents, fp vs int8, must agree within 5% relative
    RMS in standardized space (measured 3.4% on this random-weight tiny
    model — per-matmul int8 noise compounds with no trained structure to
    absorb it; this bound catches wiring/scale bugs, which land orders of
    magnitude off). The REAL gate before quant can be a config of record is
    a real-data RMSE/CRPS A/B — documented in PERF.md lever (e)."""
    from swift_tpu.sampling.factory import param_sampler_factory

    pre_fp, (H, W, C, F) = _tiny_model(None)
    pre_q, _ = _tiny_model("int8")
    params = _randomize_zero_leaves(pre_fp.init(jax.random.PRNGKey(0)))

    kw = dict(num_steps=1, sigma_min=0.02, sigma_max=200.0, auxiliary=0.6)
    s_fp = param_sampler_factory("scm", pre_fp, **kw)
    s_q = param_sampler_factory("scm", pre_q, **kw)

    X = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, C + F))
    key = jax.random.PRNGKey(4)
    y_fp = np.asarray(jax.jit(s_fp)(params, X, key))
    y_q = np.asarray(jax.jit(s_q)(params, X, key))
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    assert rel < 0.05, f"int8 forecast deviates {rel:.4f} rel RMS from fp"


def test_quant_never_touches_jvp_path():
    """quant=int8 must leave the jvp (training) forward on the fp path —
    the loss contract differentiates through the model."""
    pre_q, (H, W, C, F) = _tiny_model("int8")
    pre_fp, _ = _tiny_model(None)
    params = _randomize_zero_leaves(pre_fp.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(6), (1, H, W, C + F))
    t = jnp.full((1,), 0.7)
    aux = jnp.full((1, 1), 0.6)

    def f(p, xx):
        return p_cur.apply(p, xx, t, condition=cond, auxiliary=aux,
                           jvp=True)

    dx = jax.random.normal(jax.random.PRNGKey(7), x.shape)
    p_cur = pre_q
    yq, dyq = jax.jvp(lambda xx: f(params, xx), (x,), (dx,))
    p_cur = pre_fp
    yf, dyf = jax.jvp(lambda xx: f(params, xx), (x,), (dx,))
    np.testing.assert_allclose(np.asarray(yq), np.asarray(yf), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dyq), np.asarray(dyf), rtol=1e-5,
                               atol=1e-5)
