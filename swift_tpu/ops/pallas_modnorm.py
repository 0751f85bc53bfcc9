"""Fused residual + LayerNorm + AdaLN modulation epilogue (TPU Pallas).

Every SwinV2 block applies ``x = x + modnorm(y, t)`` twice — after the
attention output projection and after the feed-forward (post-norm AdaLN,
reference src/swift/models/swinv2.py:77-86, :211-212). Left to XLA this is
three passes over the (B, N, D) activation per site (statistics reduce,
normalize+modulate, residual add); fused it is one read of y + x and one
write — at the flagship's B=24 forward that's ~100 ms/step of HBM traffic
(profile r2).

The kernel streams (block_tokens, D) tiles: LayerNorm statistics in fp32
over the lane axis (D is fully resident per tile), the per-sample AdaLN
scale/shift row is selected by index map (token tiles never straddle a
sample), residual added in fp32, one cast on the way out.

Backward is the plain jnp composition via ``jax.vjp`` (XLA fuses it well;
the win here is the forward/inference path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swift_tpu.ops import jvp_guard


def _kernel(y_ref, r_ref, g_ref, b_ref, ms_ref, mb_ref, o_ref, *, eps):
    y = y_ref[...].astype(jnp.float32)  # (bt, D)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(y * y, -1, keepdims=True) - mu * mu
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    ln = yn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out = ln * (1.0 + ms_ref[0, 0].astype(jnp.float32)) + mb_ref[0, 0].astype(
        jnp.float32
    )
    out = out + r_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_block(tokens_per_sample: int) -> int:
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if tokens_per_sample % bt == 0:
            return bt
    return 0


def modnorm_residual_eligible(tokens_per_sample: int) -> bool:
    return _pick_block(tokens_per_sample) > 0


def _call(y2, r2, g, b, msc, msh, eps, tokens_per_sample):
    T, D = y2.shape
    bt = _pick_block(tokens_per_sample)
    per = tokens_per_sample // bt  # tiles per sample

    def tok_spec():
        return pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def vec_spec():
        return pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def mod_spec():
        # (B, 1, D) so the block's last two dims equal the array dims
        return pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        in_specs=[tok_spec(), tok_spec(), vec_spec(), vec_spec(),
                  mod_spec(), mod_spec()],
        out_specs=tok_spec(),
        out_shape=jax.ShapeDtypeStruct((T, D), r2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * T * D,
            bytes_accessed=3 * T * D * y2.dtype.itemsize,
            transcendentals=0,
        ),
    )(y2, r2, g.reshape(1, D), b.reshape(1, D),
      msc.reshape(-1, 1, D), msh.reshape(-1, 1, D))


def reference_modnorm_residual(y, residual, g, b, mod_scale, mod_shift,
                               eps=1e-6):
    """jnp composition: residual + (LN(y)·g+b)·(1+scale)+shift, fp32 math.

    ``residual=None`` skips the add (plain post-norm AdaLN)."""
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, -1, keepdims=True)
    var = jnp.mean(yf * yf, -1, keepdims=True) - mu * mu
    yn = (yf - mu) * jax.lax.rsqrt(var + eps)
    ln = yn * g.astype(jnp.float32) + b.astype(jnp.float32)
    extra = y.ndim - mod_scale.ndim
    sc = mod_scale.reshape(mod_scale.shape[0], *(1,) * extra, -1)
    sh = mod_shift.reshape(mod_shift.shape[0], *(1,) * extra, -1)
    out = ln * (1.0 + sc.astype(jnp.float32)) + sh.astype(jnp.float32)
    if residual is None:
        return out.astype(y.dtype)
    return (out + residual.astype(jnp.float32)).astype(residual.dtype)


def sharded_modnorm_residual(y, residual, g, b, mod_scale, mod_shift,
                             eps=1e-6, mesh=None, data_axis=None, jvp=False):
    """fused_modnorm_residual, shard_map'd over the batch when a mesh is
    configured (pallas_call under bare GSPMD would force replication).
    Raises ValueError on untileable shapes — callers fall back to jnp."""
    if mesh is None:
        return fused_modnorm_residual(y, residual, g, b, mod_scale,
                                      mod_shift, eps, jvp=jvp)
    B = y.shape[0]
    if (
        data_axis is None
        or data_axis not in mesh.axis_names
        or mesh.shape[data_axis] <= 1
        or B % mesh.shape[data_axis]
    ):
        raise ValueError("batch does not shard over the mesh")
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bspec = P(data_axis, *([None] * (y.ndim - 1)))
    mspec = P(data_axis, None)
    vspec = P(None)

    def f(y, r, g, b, msc, msh):
        return fused_modnorm_residual(y, r, g, b, msc, msh, eps, jvp=jvp)

    return shard_map(
        f, mesh=mesh,
        in_specs=(bspec, bspec, vspec, vspec, mspec, mspec),
        out_specs=bspec, check_vma=False,
    )(y, residual, g, b, mod_scale, mod_shift)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(y2, r2, g, b, msc, msh, eps, tokens_per_sample):
    return _call(y2, r2, g, b, msc, msh, eps, tokens_per_sample)


def _fused_fwd(y2, r2, g, b, msc, msh, eps, tokens_per_sample):
    out = _call(y2, r2, g, b, msc, msh, eps, tokens_per_sample)
    return out, (y2, r2, g, b, msc, msh)


def _fused_bwd(eps, tps, res, dout):
    y2, r2, g, b, msc, msh = res
    B = msc.shape[0]
    per = y2.shape[0] // B

    def ref(y2, r2, g, b, msc, msh):
        y = y2.reshape(B, per, -1)
        r = r2.reshape(B, per, -1)
        return reference_modnorm_residual(y, r, g, b, msc, msh, eps).reshape(
            y2.shape
        )

    _, vjp = jax.vjp(ref, y2, r2, g, b, msc, msh)
    return vjp(dout)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Forward-mode (sCM jvp) tangent: one VPU pass instead of the jnp fallback's
# three over the activation. AdaLN scale/shift DO carry tangents (they are
# Dense(t) with t differentiated by the sCM jvp); the LN affine params g/b
# do not (params are constants under the loss's jax.jvp).


def _mn_tangent_kernel(y_ref, dy_ref, dr_ref, g_ref, b_ref, ms_ref, dms_ref,
                       dmb_ref, o_ref, *, eps):
    y = y_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(y * y, -1, keepdims=True) - mu * mu
    rs = jax.lax.rsqrt(var + eps)
    yn = (y - mu) * rs
    dmu = jnp.mean(dy, -1, keepdims=True)
    dvar = 2.0 * (jnp.mean(y * dy, -1, keepdims=True) - mu * dmu)
    dyn = rs * (dy - dmu) - 0.5 * yn * (rs * rs) * dvar
    g = g_ref[0].astype(jnp.float32)
    ln = yn * g + b_ref[0].astype(jnp.float32)
    dln = dyn * g
    dout = (
        dln * (1.0 + ms_ref[0, 0].astype(jnp.float32))
        + ln * dms_ref[0, 0].astype(jnp.float32)
        + dmb_ref[0, 0].astype(jnp.float32)
        + dr_ref[...].astype(jnp.float32)
    )
    o_ref[...] = dout.astype(o_ref.dtype)


def _tangent_call(y2, dy2, dr2, g, b, msc, dmsc, dmsh, eps, tokens_per_sample):
    T, D = y2.shape
    bt = _pick_block(tokens_per_sample)
    per = tokens_per_sample // bt
    tok = lambda: pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda: pl.BlockSpec((1, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    mod = lambda: pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mn_tangent_kernel, eps=eps),
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        in_specs=[tok(), tok(), tok(), vec(), vec(), mod(), mod(), mod()],
        out_specs=tok(),
        out_shape=jax.ShapeDtypeStruct((T, D), dr2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=18 * T * D,
            bytes_accessed=4 * T * D * y2.dtype.itemsize,
            transcendentals=0,
        ),
    )(y2, dy2, dr2, g.reshape(1, D), b.reshape(1, D),
      msc.reshape(-1, 1, D), dmsc.reshape(-1, 1, D), dmsh.reshape(-1, 1, D))


@functools.partial(jax.custom_jvp, nondiff_argnums=(6, 7))
def _mn_jvp_capable(y2, r2, g, b, msc, msh, eps, tokens_per_sample):
    """Same fused primal as ``_fused`` plus a forward-mode rule. g/b
    tangents are assumed zero (params are constants under the sCM loss's
    jax.jvp — the same contract as the attention/FFN jvp-capable entries)."""
    return _call(y2, r2, g, b, msc, msh, eps, tokens_per_sample)


@functools.partial(_mn_jvp_capable.defjvp, symbolic_zeros=True)
def _mn_jvp_rule(eps, tps, primals, tangents):
    y2, r2, g, b, msc, msh = primals
    dy2, dr2, dg, db, dmsc, dmsh = tangents
    jvp_guard.require_zero_tangents("fused_modnorm_residual", g=dg, b=db)
    dy2 = jvp_guard.materialize(dy2)
    dr2 = jvp_guard.materialize(dr2)
    dmsc = jvp_guard.materialize(dmsc)
    dmsh = jvp_guard.materialize(dmsh)
    out = _fused(y2, r2, g, b, msc, msh, eps, tps)  # vjp-capable primal
    sg = jax.lax.stop_gradient
    dout = _tangent_call(
        sg(y2), sg(dy2.astype(y2.dtype)), sg(dr2.astype(r2.dtype)),
        sg(g), sg(b), sg(msc),
        sg(dmsc.astype(msc.dtype)), sg(dmsh.astype(msh.dtype)),
        eps, tps,
    )
    return out, dout


def _mm_mn_kernel(x_ref, w_ref, r_ref, g_ref, b_ref, ms_ref, mb_ref, o_ref,
                  *, eps):
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(y * y, -1, keepdims=True) - mu * mu
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    ln = yn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out = ln * (1.0 + ms_ref[0, 0].astype(jnp.float32)) + mb_ref[0, 0].astype(
        jnp.float32
    )
    o_ref[...] = (out + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _mm_mn_call(x2, w, r2, g, b, msc, msh, eps, tps):
    import math

    T, F = x2.shape
    D = w.shape[1]
    bt = _pick_block(math.gcd(T, tps))
    per = tps // bt
    return pl.pallas_call(
        functools.partial(_mm_mn_kernel, eps=eps),
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((bt, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), r2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * F * D + 10 * T * D,
            bytes_accessed=(T * (F + 2 * D) + F * D) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, w, r2, g.reshape(1, D), b.reshape(1, D),
      msc.reshape(-1, 1, D), msh.reshape(-1, 1, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mm_mn(x2, w, r2, g, b, msc, msh, eps, tps):
    return _mm_mn_call(x2, w, r2, g, b, msc, msh, eps, tps)


def _fused_mm_mn_fwd(x2, w, r2, g, b, msc, msh, eps, tps):
    out = _mm_mn_call(x2, w, r2, g, b, msc, msh, eps, tps)
    return out, (x2, w, r2, g, b, msc, msh)


def _fused_mm_mn_bwd(eps, tps, res, dy):
    x2, w, r2, g, b, msc, msh = res
    B = msc.shape[0]
    per = x2.shape[0] // B

    def ref(x2, w, r2, g, b, msc, msh):
        y = jnp.dot(x2, w.astype(x2.dtype)).reshape(B, per, -1)
        r = r2.reshape(B, per, -1)
        return reference_modnorm_residual(y, r, g, b, msc, msh, eps).reshape(
            r2.shape
        )

    _, vjp = jax.vjp(ref, x2, w, r2, g, b, msc, msh)
    return vjp(dy)


_fused_mm_mn.defvjp(_fused_mm_mn_fwd, _fused_mm_mn_bwd)


# ---------------------------------------------------------------------------
# int8 variant of the wo+modnorm epilogue (PERF.md lever (e) follow-up): with
# quant="int8" the qkv/FFN matmuls already run int8 — this makes the output
# projection the same, so the whole projection chain rides the MXU's 2x int8
# rate. Same quantization scheme as ops/quant.py (per-token activation scales
# in-kernel, per-column weight scales hoisted by the caller). Inference-only:
# no vjp/jvp rules by design.


def _mm_mn_q_kernel(x_ref, wq_ref, sw_ref, r_ref, g_ref, b_ref, ms_ref,
                    mb_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-30) * (
        1.0 / 127.0
    )
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * sw_ref[...]
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(y * y, -1, keepdims=True) - mu * mu
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    ln = yn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out = ln * (1.0 + ms_ref[0, 0].astype(jnp.float32)) + mb_ref[0, 0].astype(
        jnp.float32
    )
    o_ref[...] = (out + r_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_matmul_modnorm_residual_int8(x, w, residual, g, b, mod_scale,
                                       mod_shift, eps=1e-6):
    """int8 ``residual + modnorm(x @ w)`` — dynamic per-token activation
    scales in-kernel, per-column weight scales outside (loop-invariant ->
    hoisted out of the solver scan). Same contract as
    ``fused_matmul_modnorm_residual``; inference-only (no vjp/jvp)."""
    import math

    from swift_tpu.ops.quant import quantize_colwise

    B = x.shape[0]
    F = x.shape[-1]
    D = w.shape[1]
    tps = 1
    for s in x.shape[1:-1]:
        tps *= s
    x2 = x.reshape(-1, F)
    T = x2.shape[0]
    bt = _pick_block(math.gcd(T, tps))
    if bt == 0:
        raise ValueError(f"token count {T} does not tile")
    per = tps // bt
    wq, sw = quantize_colwise(w)
    r2 = residual.reshape(-1, D).astype(residual.dtype)
    msc = mod_scale.astype(x.dtype)
    msh = mod_shift.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_mm_mn_q_kernel, eps=eps),
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((bt, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), residual.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * F * D + 10 * T * D,
            bytes_accessed=T * F * x.dtype.itemsize
            + 2 * T * D * residual.dtype.itemsize + F * D,
            transcendentals=0,
        ),
    )(x2, wq, sw, r2, g.reshape(1, D), b.reshape(1, D),
      msc.reshape(-1, 1, D), msh.reshape(-1, 1, D))
    return out.reshape(residual.shape)


def reference_matmul_modnorm_residual_int8(x, w, residual, g, b, mod_scale,
                                           mod_shift, eps=1e-6):
    """jnp mirror of the int8 epilogue kernel: identical quantization
    points (per-token x, per-column w), XLA ops — the CPU path and the
    numerics oracle for the kernel test."""
    from swift_tpu.ops.quant import int8_matmul

    y = int8_matmul(x, w)
    return reference_modnorm_residual(y, residual, g, b, mod_scale,
                                      mod_shift, eps)


def fused_matmul_modnorm_residual(x, w, residual, g, b, mod_scale, mod_shift,
                                  eps=1e-6):
    """``residual + modnorm(x @ w)`` in one kernel (weights VMEM-resident,
    the matmul output never reaches HBM) — the attention output-projection
    epilogue. x: (B, ..., F); w: (F, D); residual: (B, ..., D).
    Raises ValueError when shapes don't tile."""
    import math

    B = x.shape[0]
    F = x.shape[-1]
    D = w.shape[1]
    tps = 1
    for s in x.shape[1:-1]:
        tps *= s
    x2 = x.reshape(-1, F)
    if _pick_block(math.gcd(x2.shape[0], tps)) == 0:
        raise ValueError(f"token count {x2.shape[0]} does not tile")
    out = _fused_mm_mn(
        x2, w.astype(x.dtype), residual.reshape(-1, D).astype(x.dtype),
        g, b, mod_scale.astype(x.dtype), mod_shift.astype(x.dtype), eps, tps,
    )
    return out.reshape(residual.shape)


def fused_modnorm_residual(y, residual, g, b, mod_scale, mod_shift, eps=1e-6,
                           jvp=False):
    """``residual + (LayerNorm(y)·g + b)·(1 + mod_scale) + mod_shift``.

    y / residual: (B, ..., D); g / b: (D,) LayerNorm affine params;
    mod_scale / mod_shift: (B, D) per-sample AdaLN rows. Returns
    residual.dtype. Raises ValueError when the per-sample token count
    doesn't tile (callers fall back to reference_modnorm_residual).
    With ``jvp=True`` the entry carries a forward-mode rule (fused tangent
    kernel) for the sCM jvp forward.
    """
    B = y.shape[0]
    D = y.shape[-1]
    tps = 1
    for s in y.shape[1:-1]:
        tps *= s
    if not modnorm_residual_eligible(tps):
        raise ValueError(f"tokens per sample {tps} does not tile")
    y2 = y.reshape(B * tps, D)
    r2 = residual.reshape(B * tps, D)
    fn = _mn_jvp_capable if jvp else _fused
    out = fn(y2, r2, g, b,
             mod_scale.astype(y.dtype), mod_shift.astype(y.dtype),
             eps, tps)
    return out.reshape(residual.shape)
