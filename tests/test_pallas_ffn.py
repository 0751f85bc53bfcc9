"""Pallas fused SwiGLU FFN vs the jnp reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import swift_tpu.ops.pallas_ffn as pf

T, D, H = 256, 64, 160  # token count tiles at bt=128/256


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        orig = pl.pallas_call
        monkeypatch.setattr(
            pf.pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


def _inputs(key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (T, D), dtype)
    w1 = (jax.random.normal(ks[1], (D, 2 * H)) * 0.05).astype(jnp.float32)
    w2 = (jax.random.normal(ks[2], (H, D)) * 0.05).astype(jnp.float32)
    return x, w1, w2


def test_forward_matches_reference():
    x, w1, w2 = _inputs()
    out_p = pf.fused_swiglu_ffn(x, w1, w2)
    out_r = pf.reference_swiglu_ffn(x, w1, w2)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=2e-3, atol=2e-3)


def test_bwd_save_routing_boundary(monkeypatch):
    """The default token budget rides the saved-activation backward at the
    1.4° flagship train batch (16 x 64x128 = 131072 tokens, measured win:
    FFN bwd 236 -> 183 ms/site) but keeps the recompute kernel at the
    memory-tight 0.25° B=1 grid (364x720 = 262080 tokens). PERF.md r4."""
    monkeypatch.delenv("SWIFT_FFN_BWD_SAVE_MAX_TOKENS", raising=False)
    from swift_tpu.ops.pallas_ffn import _bwd_save_acts

    assert _bwd_save_acts(16 * 64 * 128)
    assert not _bwd_save_acts(364 * 720)


@pytest.mark.parametrize("save_max", ["0", str(10**9)])
def test_backward_matches_reference(save_max, monkeypatch):
    """Both backward variants: save_max=0 forces the recompute kernel,
    the huge threshold forces the saved-gate/up kernel (r4 lever)."""
    monkeypatch.setenv("SWIFT_FFN_BWD_SAVE_MAX_TOKENS", save_max)
    x, w1, w2 = _inputs(1)

    def loss_p(x, w1, w2):
        return jnp.sum(pf.fused_swiglu_ffn(x, w1, w2) ** 2)

    def loss_r(x, w1, w2):
        return jnp.sum(pf.reference_swiglu_ffn(x, w1, w2) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w1, w2)
    for a, b, name in zip(gp, gr, ["dx", "dw1", "dw2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_backward_saved_acts_under_remat():
    """jax.checkpoint around the saved-acts path: the fwd rule (and its
    gate/up residuals) must live inside the rematerialized backward
    segment and still produce reference gradients — the exact composition
    the trainer runs (per-pair remat over the layer scan)."""
    x, w1, w2 = _inputs(6)

    @jax.checkpoint
    def blk(x, w1, w2):
        return pf.fused_swiglu_ffn(x, w1, w2)

    gp = jax.grad(lambda *a: jnp.sum(blk(*a) ** 2), argnums=(0, 1, 2))(
        x, w1, w2)
    gr = jax.grad(
        lambda *a: jnp.sum(pf.reference_swiglu_ffn(*a) ** 2),
        argnums=(0, 1, 2),
    )(x, w1, w2)
    for a, b, name in zip(gp, gr, ["dx", "dw1", "dw2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_nontiling_token_count_raises():
    x, w1, w2 = _inputs(2)
    with pytest.raises(ValueError, match="does not tile"):
        pf.fused_swiglu_ffn(x[:100], w1, w2)


def test_swinv2_pallas_ffn_matches_jnp_model():
    """Full SwinV2 forward with use_pallas=True (fused attention + fused
    FFN, interpret) == use_pallas=False, same params."""
    from swift_tpu.models.swinv2 import SwinV2

    model_p = SwinV2(
        img_resolution=(8, 16), in_channels=6, out_channels=3,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(1, 1),
        depth=2, dim=32, heads=4, dtype=jnp.float32, use_pallas=True,
    )
    model_r = model_p.clone(use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 6))
    t = jnp.array([0.5, 1.2])
    params = model_r.init(jax.random.PRNGKey(1), x, t)["params"]
    # randomize the zero-init head so the comparison is non-trivial
    params["head"]["kernel"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(2),
                                 params["head"]["kernel"].shape)
    )
    y_p = model_p.apply({"params": params}, x, t)
    y_r = model_r.apply({"params": params}, x, t)
    # tolerance dominated by the attention kernel's intentional bf16 MXU
    # casts (same bound as tests/test_pallas_attention.py); the FFN kernel
    # itself is exact to ~1e-7 (test_forward_matches_reference).
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                               rtol=2e-2, atol=2e-2)


def test_fused_swiglu_modnorm_matches_composition():
    """FFN + modnorm + residual epilogue == the separate composition."""
    import swift_tpu.ops.pallas_modnorm as pm
    from swift_tpu.ops.pallas_ffn import (
        fused_swiglu_ffn_modnorm,
        reference_swiglu_ffn,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    B, N, D, H = 2, 64, 32, 85
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32)
    w1 = 0.1 * jax.random.normal(ks[1], (D, 2 * H), jnp.float32)
    w2 = 0.1 * jax.random.normal(ks[2], (H, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    msc = 0.2 * jax.random.normal(ks[5], (B, D), jnp.float32)
    msh = 0.2 * jax.random.normal(ks[6], (B, D), jnp.float32)

    out = fused_swiglu_ffn_modnorm(x, w1, w2, g, b, msc, msh)
    y = reference_swiglu_ffn(x, w1, w2)
    exp = pm.reference_modnorm_residual(y, x, g, b, msc, msh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)

    def lp(x, w1, w2, g, b, msc, msh):
        return jnp.sum(
            fused_swiglu_ffn_modnorm(x, w1, w2, g, b, msc, msh) ** 2)

    def lr(x, w1, w2, g, b, msc, msh):
        y = reference_swiglu_ffn(x, w1, w2)
        return jnp.sum(
            pm.reference_modnorm_residual(y, x, g, b, msc, msh) ** 2)

    gp = jax.grad(lp, argnums=tuple(range(7)))(x, w1, w2, g, b, msc, msh)
    gr = jax.grad(lr, argnums=tuple(range(7)))(x, w1, w2, g, b, msc, msh)
    for a, e in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4)


def test_jvp_variant_matches_reference():
    """jax.jvp through the jvp-capable entry (combined primal+tangent
    kernel, gate/up shared in VMEM) == jvp through the jnp reference (the
    sCM jvp forward path)."""
    x, w1, w2 = _inputs(3)
    dx = jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype)

    op, dop = jax.jvp(
        lambda x: pf.fused_swiglu_ffn(x, w1, w2, jvp=True), (x,), (dx,)
    )
    orf, dorf = jax.jvp(
        lambda x: pf.reference_swiglu_ffn(x, w1, w2), (x,), (dx,)
    )
    np.testing.assert_allclose(np.asarray(op), np.asarray(orf),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dop), np.asarray(dorf),
                               rtol=2e-3, atol=2e-3)


def test_combined_primal_tangent_kernel_direct():
    """_ffn_pt_call emits (y, dy) from one pass; both must match the
    separate primal kernel and the jnp jvp."""
    x, w1, w2 = _inputs(4)
    dx = jax.random.normal(jax.random.PRNGKey(11), x.shape, x.dtype)
    H = w1.shape[1] // 2
    wg, wu = w1[:, :H], w1[:, H:]
    o, do = pf._ffn_pt_call(x, dx, wg, wu, w2)
    o_ref, do_ref = jax.jvp(
        lambda x: pf.reference_swiglu_ffn(x, w1, w2), (x,), (dx,)
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(do), np.asarray(do_ref),
                               rtol=2e-3, atol=2e-3)


def test_jvp_weight_tangent_raises():
    """The jvp-capable entry propagates tangents only through activations
    (the sCM contract: params are constants under jax.jvp). A weight
    tangent must raise loudly at trace time instead of being silently
    dropped (r3 ADVICE)."""
    x, w1, w2 = _inputs(5)
    dw1 = jax.random.normal(jax.random.PRNGKey(12), w1.shape, w1.dtype)

    with pytest.raises(NotImplementedError, match="fused_swiglu_ffn"):
        jax.jvp(
            lambda w1: pf.fused_swiglu_ffn(x, w1, w2, jvp=True),
            (w1,), (dw1,),
        )
