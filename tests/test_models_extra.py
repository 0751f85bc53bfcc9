"""Tests for secondary backbones: Swin v1 (RoPE), SongUNet, EDM2 UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_tpu.models.edm2 import (
    EDM2UNet,
    force_weight_norm,
    mp_cat,
    mp_sum,
    normalize,
)
from swift_tpu.models.songunet import SongUNet, cylindrical_pad
from swift_tpu.models.swin import Swin, apply_rope2d, positional_encoding_2d, rope2d_cache

H, W = 8, 16


def test_swin_v1_forward_and_grad():
    m = Swin(
        img_resolution=(H, W), in_channels=4, out_channels=3,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=32, heads=4, head_dim=8, mlp_dim=64,
        auxiliary_dim=1, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 4))
    t = jnp.array([0.5, 1.0])
    params = m.init(jax.random.PRNGKey(1), x, t, auxiliary=jnp.ones((2, 1)))["params"]
    y = m.apply({"params": params}, x, t, auxiliary=jnp.ones((2, 1)))
    assert y.shape == (2, H, W, 3)
    assert jnp.isfinite(y).all()

    g = jax.grad(
        lambda p: jnp.sum(m.apply({"params": p}, x, t, auxiliary=jnp.ones((2, 1))) ** 2)
    )(params)
    assert all(jnp.isfinite(l).all() for l in jax.tree_util.tree_leaves(g))


def test_rope2d_preserves_norm():
    cache = rope2d_cache((2, 2), rope_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 8))  # (..., n=4, d=8)
    y = apply_rope2d(x, cache)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )
    # position 0 is the identity rotation
    np.testing.assert_allclose(np.asarray(y[..., 0, :]), np.asarray(x[..., 0, :]),
                               rtol=1e-6)


def test_positional_encoding_2d_shape():
    pe = positional_encoding_2d(8, 16, 5)
    assert pe.shape == (8, 16, 5)
    assert np.isfinite(np.asarray(pe)).all()


def test_cylindrical_pad():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    p = cylindrical_pad(x, 1, "circular")
    assert p.shape == (1, 5, 6, 1)
    # latitude (H) zero-padded
    assert np.all(np.asarray(p[0, 0]) == 0) and np.all(np.asarray(p[0, -1]) == 0)
    # longitude (W) wraps
    np.testing.assert_array_equal(np.asarray(p[0, 1, 0]), np.asarray(x[0, 0, -1]))
    np.testing.assert_array_equal(np.asarray(p[0, 1, -1]), np.asarray(x[0, 0, 0]))


def test_songunet_forward():
    m = SongUNet(
        img_resolution=(H, W), in_channels=5, out_channels=3,
        auxiliary_dim=1, model_channels=8, channel_mult=(2, 2),
        num_blocks=1, attn_resolutions=((4, 8),), dropout=0.0,
        embedding_type="positional", encoder_type="standard",
        decoder_type="standard", resample_filter=(1, 1),
        padding_mode="circular",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 5))
    t = jnp.array([0.3, 0.8])
    params = m.init(jax.random.PRNGKey(1), x, t, auxiliary=jnp.ones((2, 1)))["params"]
    y = m.apply({"params": params}, x, t, auxiliary=jnp.ones((2, 1)))
    assert y.shape == (2, H, W, 3)
    assert jnp.isfinite(y).all()
    # zero-ish init of the output conv -> tiny outputs
    assert float(jnp.abs(y).max()) < 1e-2


def test_songunet_residual_encoder():
    m = SongUNet(
        img_resolution=(H, W), in_channels=4, out_channels=2,
        model_channels=8, channel_mult=(1, 2), num_blocks=1,
        encoder_type="residual", decoder_type="standard",
        embedding_type="fourier", attn_resolutions=(),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, 4))
    params = m.init(jax.random.PRNGKey(1), x, jnp.array([0.5]))["params"]
    y = m.apply({"params": params}, x, jnp.array([0.5]))
    assert y.shape == (1, H, W, 2)


def test_mp_primitives():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64)) * 3
    n = normalize(x)
    norms = np.linalg.norm(np.asarray(n), axis=1) / np.sqrt(64)
    np.testing.assert_allclose(norms, 1.0, atol=0.05)

    a = jax.random.normal(jax.random.PRNGKey(1), (1024,))
    b = jax.random.normal(jax.random.PRNGKey(2), (1024,))
    s = mp_sum(a, b, 0.3)
    assert abs(float(jnp.std(s)) - 1.0) < 0.1  # magnitude preserved

    c = mp_cat(a[None], b[None], axis=-1, t=0.5)
    assert abs(float(jnp.std(c)) - 1.0) < 0.1


def test_edm2_unet_forward():
    m = EDM2UNet(
        img_resolution=(H, W), in_channels=4, out_channels=2,
        auxiliary_dim=1, model_channels=16, channel_mult=(1, 2),
        num_blocks=1, attn_resolutions=((4, 8),),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 4))
    t = jnp.array([0.2, 0.9])
    params = m.init(jax.random.PRNGKey(1), x, t, auxiliary=jnp.ones((2, 1)))["params"]
    y = m.apply({"params": params}, x, t, auxiliary=jnp.ones((2, 1)))
    assert y.shape == (2, H, W, 2)
    # out_gain starts at 0 -> exactly zero output
    np.testing.assert_array_equal(np.asarray(y), 0.0)

    # after perturbing out_gain, outputs are non-zero and finite
    params = dict(params)
    params["out_gain"] = jnp.float32(1.0)
    y2 = m.apply({"params": params}, x, t, auxiliary=jnp.ones((2, 1)))
    assert jnp.isfinite(y2).all() and float(jnp.abs(y2).max()) > 0


def test_force_weight_norm():
    m = EDM2UNet(
        img_resolution=(H, W), in_channels=3, out_channels=2,
        model_channels=16, channel_mult=(1,), num_blocks=1,
        attn_resolutions=(),
    )
    x = jnp.zeros((1, H, W, 3))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([0.5]))["params"]
    scaled = jax.tree_util.tree_map(lambda a: a * 3.0, params)
    fixed = force_weight_norm(scaled)

    def check(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if names[-1] == "mp_weight":
            per_row = np.linalg.norm(
                np.asarray(leaf).reshape(leaf.shape[0], -1), axis=1
            ) / np.sqrt(np.prod(leaf.shape[1:]))
            np.testing.assert_allclose(per_row, 1.0, atol=0.05)
        return leaf

    jax.tree_util.tree_map_with_path(check, fixed)
