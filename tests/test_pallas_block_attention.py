"""Layout-native block attention kernel vs the jnp reference.

On CPU these run the Pallas kernels in interpreter mode; on TPU the real
kernels compile. Forward (shifted + unshifted), backward (custom_vjp incl.
the in-kernel cosine-normalize and logit-scale gradients), model-level
consistency and the TP shard_map wrapper are all checked.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_block_attention as pba

B, GH, GW, HEADS, D = 2, 8, 16, 3, 8  # window (4, 8) -> n = 32
WIN = (4, 8)
FEAT = HEADS * 3 * D


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force pallas interpreter mode off-TPU."""
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pba.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    qkv = jax.random.normal(ks[0], (B, GH, GW, FEAT), jnp.float32)
    scale = jnp.exp(jax.random.normal(ks[1], (HEADS,)) * 0.1 + 1.0)
    return qkv, scale


def test_eligibility_gate():
    assert pba.block_attention_eligible((8, 16), (4, 8), (0, 0), 3, 24)
    assert pba.block_attention_eligible((64, 128), (16, 16), (8, 8), 12, 1056)
    # heads don't divide
    assert not pba.block_attention_eligible((8, 16), (4, 8), (0, 0), 5, 24)
    # window cols not sublane-aligned with >1 window column
    assert not pba.block_attention_eligible((8, 16), (4, 4), (0, 0), 3, 24)
    # width shift not 8-aligned
    assert not pba.block_attention_eligible((64, 128), (16, 16), (8, 4), 12, 1056)


@pytest.mark.parametrize("shift", [(0, 0), (2, 8)])
def test_forward_matches_reference(shift):
    qkv, scale = _inputs()
    out_p = pba.fused_block_attention(qkv, scale, HEADS, WIN, shift)
    out_r = pba.reference_block_attention(qkv, scale, HEADS, WIN, shift)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("shift", [(0, 0), (2, 8)])
def test_backward_matches_reference(shift):
    qkv, scale = _inputs(1)

    def loss_p(qkv, s):
        return jnp.sum(pba.fused_block_attention(qkv, s, HEADS, WIN, shift) ** 2)

    def loss_r(qkv, s):
        return jnp.sum(pba.reference_block_attention(qkv, s, HEADS, WIN, shift) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(qkv, scale)
    gr = jax.grad(loss_r, argnums=(0, 1))(qkv, scale)
    for a, b, name in zip(gp, gr, ["dqkv", "dscale"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"mismatch in {name}",
        )


def test_wrap_around_window_paths():
    """Width wrap-around gather/scatter coverage (ADVICE r2): with sw < ww
    relative to gw (here gw=32, ww=16, sw=8 — the flagship's ratio) every odd
    block's windows straddle the gw boundary, exercising the _wrap_pieces
    column concat in _gather_window and the split stores in _scatter_window.
    fwd, bwd and jvp must all match the jnp reference."""
    gh, gw, win, shift = 8, 32, (4, 16), (2, 8)
    assert pba.block_attention_eligible((gh, gw), win, shift, HEADS, HEADS * D)
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    qkv = jax.random.normal(ks[0], (B, gh, gw, FEAT), jnp.float32)
    scale = jnp.exp(jax.random.normal(ks[1], (HEADS,)) * 0.1 + 1.0)
    tqkv = jax.random.normal(ks[2], qkv.shape)

    out_p = pba.fused_block_attention(qkv, scale, HEADS, win, shift)
    out_r = pba.reference_block_attention(qkv, scale, HEADS, win, shift)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=2e-5, atol=2e-5
    )

    gp = jax.grad(
        lambda a, s: jnp.sum(
            pba.fused_block_attention(a, s, HEADS, win, shift) ** 2
        ),
        argnums=(0, 1),
    )(qkv, scale)
    gr = jax.grad(
        lambda a, s: jnp.sum(
            pba.reference_block_attention(a, s, HEADS, win, shift) ** 2
        ),
        argnums=(0, 1),
    )(qkv, scale)
    for a, b, name in zip(gp, gr, ["dqkv", "dscale"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"mismatch in {name}",
        )

    _, dop = jax.jvp(
        lambda a: pba.fused_block_attention(a, scale, HEADS, win, shift,
                                            jvp=True),
        (qkv,), (tqkv,),
    )
    _, dor = jax.jvp(
        lambda a: pba.reference_block_attention(a, scale, HEADS, win, shift),
        (qkv,), (tqkv,),
    )
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dor),
                               rtol=2e-4, atol=2e-4)


def test_swinv2_block_kernel_consistency():
    """SwinV2 with the block kernel (interpreted) == the jnp path, on a
    config whose shapes are block-kernel eligible (window cols == grid
    cols; row-only shift)."""
    from swift_tpu.models.swinv2 import SwinV2

    kw = dict(
        img_resolution=(16, 16), in_channels=4, out_channels=2,
        window_size=(4, 8), shift_size=(2, 8), patch_size=(2, 2),
        depth=2, dim=24, heads=3, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.5, 0.25])
    m_ref = SwinV2(use_pallas=False, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )
    y_ref = m_ref.apply({"params": params}, x, t)
    m_pal = SwinV2(use_pallas=True, **kw)
    # the eligible path must actually be taken for this config
    assert pba.block_attention_eligible((8, 8), (4, 8), (2, 8), 3, 24)
    y_pal = m_pal.apply({"params": params}, x, t)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )


def test_swinv2_block_kernel_grad_consistency():
    """Gradients through the block kernel's custom_vjp == the jnp path."""
    from swift_tpu.models.swinv2 import SwinV2

    kw = dict(
        img_resolution=(16, 16), in_channels=4, out_channels=2,
        window_size=(4, 8), shift_size=(2, 8), patch_size=(2, 2),
        depth=2, dim=24, heads=3, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.5, 0.25])
    m_ref = SwinV2(use_pallas=False, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x, t) ** 2)
        return f

    g_ref = jax.grad(loss(m_ref))(params)
    g_pal = jax.grad(loss(SwinV2(use_pallas=True, **kw)))(params)

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )

    jax.tree_util.tree_map_with_path(check, g_pal, g_ref)


@pytest.mark.parametrize("shift", [(0, 0), (2, 8)])
def test_jvp_variant_matches_reference(shift):
    """jax.jvp through the jvp-capable block kernel == jvp through the jnp
    reference (the sCM tangent computation, block layout)."""
    qkv, scale = _inputs(5)
    tqkv = jax.random.normal(jax.random.PRNGKey(11), qkv.shape)

    def f_pallas(qkv):
        return pba.fused_block_attention(qkv, scale, HEADS, WIN, shift,
                                         jvp=True)

    def f_ref(qkv):
        return pba.reference_block_attention(qkv, scale, HEADS, WIN, shift)

    op, dop = jax.jvp(f_pallas, (qkv,), (tqkv,))
    orf, dorf = jax.jvp(f_ref, (qkv,), (tqkv,))
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dorf),
                               rtol=2e-4, atol=2e-4)


def test_scm_value_and_grad_through_block_jvp():
    """Full sCM loss (jax.jvp inside value_and_grad) through a
    block-kernel-eligible model matches the jnp path — guards both the
    custom_jvp rule and the stop_gradient structure under the outer grad."""
    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import SCMLoss

    Hh, Ww, C = 16, 16, 3
    kw = dict(
        img_resolution=(Hh, Ww), in_channels=2 * C, out_channels=C,
        window_size=(4, 8), shift_size=(2, 8), patch_size=(2, 2),
        depth=2, dim=24, heads=3, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, Hh, Ww, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, Hh, Ww, C))

    def build(use_pallas):
        model = SwinV2(use_pallas=use_pallas, **kw)
        p = PassPrecond(model=model, img_resolution=(Hh, Ww), img_channels=C,
                        condition_channels=C, auxiliary_dim=1, sigma_data=1.0)
        loss = SCMLoss(
            precond=p, lat_dim=Hh,
            variables=("2m_temperature", "geopotential_500",
                       "temperature_850"),
            noise={"dist": "loguniform", "sigma_min": 0.02,
                   "sigma_max": 200.0},
            tangent_warmup_kimg=1,
        )
        return p, loss

    p_ref, loss_ref = build(False)
    params = p_ref.init(jax.random.PRNGKey(0))

    def f(loss):
        return lambda params: loss(
            params, jax.random.PRNGKey(3), x, step=100.0, condition=cond,
            auxiliary=jnp.full((2, 1), 0.6),
        )

    _, loss_pal = build(True)
    val_p, grads_p = jax.value_and_grad(f(loss_pal))(params)
    val_r, grads_r = jax.value_and_grad(f(loss_ref))(params)
    np.testing.assert_allclose(float(val_p), float(val_r), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)


def test_shard_mapped_block_attention_matches():
    """TP composition: batch over data, head chunks over model."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    qkv, scale = _inputs(3)
    # heads=3 doesn't divide model=2 -> shard batch only; then a (1, 3)
    # mesh wouldn't test heads. Use a heads-divisible variant.
    heads, d = 4, 8
    qkv = jax.random.normal(jax.random.PRNGKey(7), (B * 2, GH, GW, heads * 3 * d))
    scale = jnp.exp(jax.random.normal(jax.random.PRNGKey(8), (heads,)) * 0.1)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    out_plain = pba.fused_block_attention(qkv, scale, heads, WIN, (0, 0))
    qs = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None, "model")))
    out_tp = jax.jit(
        lambda a: pba.sharded_block_attention(
            a, scale, heads, WIN, (0, 0),
            mesh=mesh, data_axis="data", model_axis="model",
        )
    )(qs)
    np.testing.assert_allclose(
        np.asarray(out_tp), np.asarray(out_plain), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("shift", [(0, 0), (2, 8), (3, 4)])
def test_tiled_forward_backward_jvp_match_reference(shift):
    """Window-tiled variant (large-grid kernel, r3): fwd/bwd/jvp == the jnp
    reference. shift (3, 4) is NOT expressible by the whole-grid kernel
    (width shift not 8-aligned) — the roll-based tiled kernel has no shift
    constraints."""
    gh, gw, win = 8, 32, (4, 8)
    assert pba.tiled_block_attention_eligible((gh, gw), win, HEADS, HEADS * D)
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    qkv = jax.random.normal(ks[0], (B, gh, gw, FEAT), jnp.float32)
    scale = jnp.exp(jax.random.normal(ks[1], (HEADS,)) * 0.1 + 1.0)
    tqkv = jax.random.normal(ks[2], qkv.shape)

    out_p = pba.fused_tiled_block_attention(qkv, scale, HEADS, win, shift)
    out_r = pba.reference_block_attention(qkv, scale, HEADS, win, shift)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)

    gp = jax.grad(
        lambda a, s: jnp.sum(
            pba.fused_tiled_block_attention(a, s, HEADS, win, shift) ** 2
        ),
        argnums=(0, 1),
    )(qkv, scale)
    gr = jax.grad(
        lambda a, s: jnp.sum(
            pba.reference_block_attention(a, s, HEADS, win, shift) ** 2
        ),
        argnums=(0, 1),
    )(qkv, scale)
    for a, b, name in zip(gp, gr, ["dqkv", "dscale"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"mismatch in {name}",
        )

    _, dop = jax.jvp(
        lambda a: pba.fused_tiled_block_attention(a, scale, HEADS, win,
                                                  shift, jvp=True),
        (qkv,), (tqkv,),
    )
    _, dor = jax.jvp(
        lambda a: pba.reference_block_attention(a, scale, HEADS, win, shift),
        (qkv,), (tqkv,),
    )
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dor),
                               rtol=2e-4, atol=2e-4)


def test_tiled_row_tile_picker():
    # 0.25° flagship shape: 368x720 grid, 16-wide windows, d=128
    th = pba._pick_row_tile(368, 720, 16, 128)
    assert th >= 1 and (368 // 16) % th == 0
    # tiles must fit the budget
    assert 8 * th * 16 * 720 * 128 * 2 <= 48 * 1024 * 1024
    assert pba.tiled_block_attention_eligible((368, 720), (16, 16), 12,
                                              12 * 88)
    # and the whole-grid kernel correctly rejects this size
    assert not pba.block_attention_eligible((368, 720), (16, 16), (8, 8), 12,
                                            12 * 88)


def test_swinv2_tiled_kernel_consistency():
    """SwinV2 routes to the tiled kernel when the whole-grid kernel is
    ineligible (here: width shift 4 not 8-aligned) and matches the jnp
    path, value and grad."""
    from swift_tpu.models.swinv2 import SwinV2

    kw = dict(
        img_resolution=(16, 64), in_channels=4, out_channels=2,
        window_size=(4, 8), shift_size=(2, 4), patch_size=(2, 2),
        depth=2, dim=24, heads=3, dtype=jnp.float32,
    )
    assert not pba.block_attention_eligible((8, 32), (4, 8), (2, 4), 3, 24)
    assert pba.tiled_block_attention_eligible((8, 32), (4, 8), 3, 24)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64, 4))
    t = jnp.array([0.5, 0.25])
    m_ref = SwinV2(use_pallas=False, **kw)
    params = m_ref.init(jax.random.PRNGKey(1), x, t)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )
    m_pal = SwinV2(use_pallas=True, **kw)

    y_ref = m_ref.apply({"params": params}, x, t)
    y_pal = m_pal.apply({"params": params}, x, t)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )

    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply({"params": p}, x, t) ** 2))(params)
    g_pal = jax.grad(lambda p: jnp.sum(m_pal.apply({"params": p}, x, t) ** 2))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pal),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
