"""Preconditioner tests: EDM scaling identities, condition concat, auxiliary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from swift_tpu.models.precond import EDMPrecond, Network, PassPrecond, process_auxiliary


class Probe(nn.Module):
    """Records nothing, returns a fixed function of inputs so the EDM algebra
    can be checked: F(x, t) = x[..., :C_out] * 1 (identity on first channels)."""

    out_channels: int = 2

    @nn.compact
    def __call__(self, x, t, auxiliary=None, **kw):
        # touch a param so init works
        s = self.param("s", nn.initializers.ones_init(), (1,))
        return x[..., : self.out_channels] * s


def make(kind, **kw):
    cls = {"edm": EDMPrecond, "pass": PassPrecond}[kind]
    return cls(
        model=Probe(out_channels=2),
        img_resolution=(4, 4),
        img_channels=2,
        condition_channels=kw.pop("condition_channels", 2),
        auxiliary_dim=kw.pop("auxiliary_dim", 0),
        **kw,
    )


def test_process_auxiliary():
    assert process_auxiliary(None, 0, 3) is None
    z = process_auxiliary(None, 1, 3)
    np.testing.assert_array_equal(np.asarray(z), np.zeros((3, 1)))
    b = process_auxiliary(0.6, 1, 4)
    np.testing.assert_allclose(np.asarray(b), 0.6 * np.ones((4, 1)))
    v = process_auxiliary(jnp.array([1.0, 2.0]), 1, 2)
    assert v.shape == (2, 1)


def test_edm_precond_scaling():
    """D_x = c_skip·x + c_out·F(c_in·x) with F = identity must satisfy the
    closed form (reference precond.py:80-91)."""
    p = make("edm", sigma_data=0.5)
    params = p.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 2))
    sigma = jnp.array([0.1, 1.0, 10.0])
    out = p.apply(params, x, sigma)

    sd = 0.5
    s = np.asarray(sigma).reshape(-1, 1, 1, 1)
    c_skip = sd**2 / (s**2 + sd**2)
    c_out = s * sd / np.sqrt(s**2 + sd**2)
    c_in = 1 / np.sqrt(sd**2 + s**2)
    expected = c_skip * np.asarray(x) + c_out * (c_in * np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_pass_precond_concat():
    p = make("pass")
    params = p.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 4, 4, 2))
    cond = 3.0 * jnp.ones((2, 4, 4, 2))
    out = p.apply(params, x, jnp.array([0.5, 0.5]), condition=cond)
    # Probe returns first 2 channels of concat([x, cond]) = x
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_network_bundle():
    p = make("pass", sigma_data=2.0)
    params = p.init(jax.random.PRNGKey(0))
    net = Network(p, params)
    assert net.sigma_data == 2.0
    assert net.img_channels == 2
    out = net(jnp.ones((1, 4, 4, 2)), jnp.array([1.0]))
    assert out.shape == (1, 4, 4, 2)
