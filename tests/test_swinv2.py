"""SwinV2 model tests: shapes, logvar head, zero-init head, jvp path, shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_tpu.models.swinv2 import SwinV2


def tiny_model(**kw):
    cfg = dict(
        img_resolution=(8, 16),
        in_channels=6,
        out_channels=3,
        window_size=(2, 2),
        shift_size=(1, 1),
        patch_size=(2, 2),
        depth=2,
        dim=32,
        heads=4,
        auxiliary_dim=1,
        logvar=True,
        dtype=jnp.float32,
    )
    cfg.update(kw)
    return SwinV2(**cfg)


@pytest.fixture(scope="module")
def model_and_params():
    m = tiny_model()
    x = jnp.zeros((2, 8, 16, 6))
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(0), x, t, auxiliary=jnp.zeros((2, 1)))["params"]
    return m, params


def test_forward_shape(model_and_params):
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 6))
    t = jnp.array([0.5, 1.2])
    y = m.apply({"params": params}, x, t, auxiliary=jnp.ones((2, 1)))
    assert y.shape == (2, 8, 16, 3)
    assert jnp.isfinite(y).all()


def test_zero_init_head_gives_zero_output(model_and_params):
    """Output head is zero-initialized (reference swinv2.py:295-303), so a
    fresh model must output exactly zero."""
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 6))
    y = m.apply({"params": params}, x, jnp.array([0.7]))
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_logvar_head(model_and_params):
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 6))
    y, lv = m.apply(
        {"params": params}, x, jnp.array([0.1, 0.9]), return_logvar=True
    )
    assert y.shape == (2, 8, 16, 3)
    assert lv.shape == (2,)


def test_scalar_t_broadcast(model_and_params):
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 8, 16, 6))
    y = m.apply({"params": params}, x, jnp.float32(1.5))
    assert y.shape == (3, 8, 16, 3)


def test_jvp_through_model(model_and_params):
    """sCM needs jax.jvp through the full forward (reference loss.py:212-220)."""
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 16, 6))
    t = jnp.array([0.8])

    def f(x, t):
        return m.apply({"params": params}, x, t, jvp=True)

    y, dy = jax.jvp(f, (x, t), (jnp.ones_like(x), jnp.ones_like(t)))
    assert y.shape == dy.shape == (1, 8, 16, 3)
    assert jnp.isfinite(dy).all()


def test_grad_through_model(model_and_params):
    m, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 16, 6))

    def loss(p):
        y = m.apply({"params": p}, x, jnp.array([0.3]))
        return jnp.sum(y**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)


def test_param_count_flagship_config():
    """The flagship 253M config (reference experiment/era5-swinv2-1.4-scm.yaml:22-28,
    logvar head included per swinv2 main block :333-359) must land at ~253M."""
    m = SwinV2(
        img_resolution=(128, 256),
        in_channels=69 * 2 + 3,
        out_channels=69,
        window_size=(16, 16),
        shift_size=(8, 8),
        patch_size=(2, 2),
        depth=12,
        dim=1056,
        heads=12,
        auxiliary_dim=1,
        logvar=True,
    )
    x = jnp.zeros((1, 128, 256, 69 * 2 + 3))
    params = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                       auxiliary=jnp.zeros((1, 1)))["params"]
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    # With patch 2x2 the architecture is ~226M; the reference's "253M" label
    # corresponds to the patch 1x1 variant whose pos_embed alone is 34.6M
    # (reference swinv2.py:333-351 uses patch_size=[1,1]).
    assert 220e6 < n < 235e6, f"param count {n/1e6:.1f}M out of range"


def test_decoupled_head_dim():
    """head_dim can be set independently of dim//heads (MXU-native 128-wide
    heads for new runs, PERF.md pad-tax lever): forward shape, zero-init
    head, and grads all work with heads*head_dim != dim."""
    m = tiny_model(heads=2, head_dim=24)  # inner 48 != dim 32
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 16, 6))
    t = jnp.array([0.3, 0.9])
    params = m.init(jax.random.PRNGKey(0), x, t, auxiliary=jnp.zeros((2, 1)))[
        "params"
    ]
    y, lv = m.apply(
        {"params": params}, x, t, auxiliary=jnp.ones((2, 1)),
        return_logvar=True,
    )
    assert y.shape == (2, 8, 16, 3)
    np.testing.assert_array_equal(np.asarray(y), 0.0)

    def loss(p):
        out = m.apply({"params": p}, x, t, auxiliary=jnp.ones((2, 1)))
        return jnp.sum(out * out)

    g = jax.grad(loss)(params)
    assert all(jnp.isfinite(l).all() for l in jax.tree_util.tree_leaves(g))


def test_factorized_pos_embed():
    """pos_embed_mode="factorized" replaces the (1, gh*gw, dim) table with
    row+col tables (the 0.25° single-chip training memory lever, PERF.md):
    params are O(gh+gw), the forward equals the learned-mode forward when
    the learned table is set to the broadcast sum, and grads flow into both
    factors."""
    m_f = tiny_model(pos_embed_mode="factorized")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 6))
    t = jnp.array([0.4, 0.7])
    aux = jnp.ones((2, 1))
    pf = m_f.init(jax.random.PRNGKey(0), x, t, auxiliary=aux)["params"]
    # the output head is zero-init; randomize it so the learned-vs-factorized
    # comparison below is not vacuously 0 == 0.
    pf = dict(pf)
    pf["head"] = {
        "kernel": 0.1
        * jax.random.normal(jax.random.PRNGKey(7), pf["head"]["kernel"].shape)
    }
    assert pf["pos_embed_row"].shape == (1, 4, 1, 32)
    assert pf["pos_embed_col"].shape == (1, 1, 8, 32)
    assert "pos_embed" not in pf

    # learned-mode model with pos_embed := row + col reproduces the output
    m_l = tiny_model()
    pl = m_l.init(jax.random.PRNGKey(0), x, t, auxiliary=aux)["params"]
    pl = dict(pl)
    pl["pos_embed"] = (pf["pos_embed_row"] + pf["pos_embed_col"]).reshape(1, 32, 32)
    for k in pf:
        if not k.startswith("pos_embed"):
            pl[k] = pf[k]
    y_f = m_f.apply({"params": pf}, x, t, auxiliary=aux)
    y_l = m_l.apply({"params": pl}, x, t, auxiliary=aux)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_l), atol=1e-5)

    def loss(p):
        return jnp.sum(m_f.apply({"params": p}, x, t, auxiliary=aux) ** 2)

    g = jax.grad(loss)(pf)
    assert float(jnp.abs(g["pos_embed_row"]).sum()) > 0
    assert float(jnp.abs(g["pos_embed_col"]).sum()) > 0


def test_non_divisible_latitude_pads_internally():
    """0.25° WB2 latitude (721 rows) doesn't divide patch·window; the model
    edge-pads internally and crops the output, so losses/samplers/trainer
    see the raw grid end to end. Scaled here: 10 rows, patch 2 × window 2
    -> padded grid 12. Parameters interchange with a model built at the
    padded resolution (same pos-embed table)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swift_tpu.models.swinv2 import SwinV2

    kw = dict(
        in_channels=4, out_channels=3, window_size=(2, 2), shift_size=(1, 1),
        patch_size=(2, 2), depth=2, dim=24, heads=3, auxiliary_dim=1,
        dtype=jnp.float32, use_pallas=False, remat_layers=False,
    )
    raw = SwinV2(img_resolution=(10, 16), **kw)
    padded = SwinV2(img_resolution=(12, 16), **kw)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 10, 16, 4)).astype(np.float32))
    t = jnp.asarray([0.4, 1.1], jnp.float32)
    aux = jnp.asarray(rng.normal(size=(2, 1)).astype(np.float32))
    v = raw.init(jax.random.PRNGKey(0), x, t, aux)

    y = raw.apply(v, x, t, aux)
    assert y.shape == (2, 10, 16, 3)

    # identical params applied at the padded resolution on the padded input
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 0), (0, 0)), mode="edge")
    yp = padded.apply(v, xp, t, aux)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yp[:, :10]),
                               rtol=0, atol=0)

    # reverse- and forward-mode AD flow through the pad/crop (training +
    # the sCM jvp forward)
    g = jax.grad(lambda vv: jnp.sum(raw.apply(vv, x, t, aux) ** 2))(v)
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
    )
    dx = jnp.ones_like(x)
    _, dy = jax.jvp(lambda xi: raw.apply(v, xi, t, aux, jvp=True), (x,), (dx,))
    assert dy.shape == (2, 10, 16, 3) and bool(jnp.isfinite(dy).all())
