"""Pallas fused linear (qkv projection kernel) vs jnp — interpret mode on
CPU. Forward, reverse-mode (dx + dw), and the combined primal+tangent
forward-mode rule (zero-weight-tangent contract)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_linear as pln

T, D, N = 256, 64, 96


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pln.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    x = jax.random.normal(ks[0], (4, T // 4, D), jnp.float32)
    w = (jax.random.normal(ks[1], (D, N)) * 0.05).astype(jnp.float32)
    return x, w


def test_forward_matches_jnp():
    x, w = _inputs()
    got = pln.fused_linear(x, w)
    ref = jnp.dot(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert got.shape == (4, T // 4, N)


def test_grads_match_jnp():
    x, w = _inputs(1)
    co = jax.random.normal(jax.random.PRNGKey(9), (4, T // 4, N))

    def f_k(x, w):
        return jnp.sum(pln.fused_linear(x, w) * co)

    def f_r(x, w):
        return jnp.sum(jnp.dot(x, w) * co)

    gx_k, gw_k = jax.grad(f_k, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(f_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r),
                               rtol=2e-4, atol=2e-4)


def test_jvp_rule_matches_jnp():
    x, w = _inputs(2)
    dx = jax.random.normal(jax.random.PRNGKey(10), x.shape)
    y_k, dy_k = jax.jvp(lambda a: pln.fused_linear(a, w, jvp=True), (x,), (dx,))
    y_r, dy_r = jax.jvp(lambda a: jnp.dot(a, w), (x,), (dx,))
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dy_k), np.asarray(dy_r),
                               rtol=2e-5, atol=2e-5)


def test_jvp_weight_tangent_raises():
    x, w = _inputs(3)
    dw = jnp.ones_like(w)
    with pytest.raises(Exception, match="fused_linear"):
        jax.jvp(lambda ww: pln.fused_linear(x, ww, jvp=True), (w,), (dw,))


def test_untileable_token_count_raises():
    x = jnp.zeros((1, 100, D))
    w = jnp.zeros((D, N))
    with pytest.raises(ValueError, match="does not tile"):
        pln.fused_linear(x, w)
