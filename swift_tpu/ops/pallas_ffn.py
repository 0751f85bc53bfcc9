"""Pallas fused SwiGLU feed-forward (TPU).

The flagship SwinV2's FFN (reference: src/swift/models/swinv2.py:89-102,
hidden = 8/3·dim) is the single largest HBM consumer in the forward pass:
XLA materializes the (tokens, 2·hidden) gate_up intermediate in HBM
(~2.2 GB per block at the bench batch). This kernel computes

    y = (silu(x @ Wg) * (x @ Wu)) @ W2

with the full weight set resident in VMEM (index maps constant across the
token grid, so Mosaic fetches each weight block once) and token tiles
streamed through — the 2·hidden intermediate lives only in VMEM.

Flagship sizes: Wg/Wu (1056, 2816) + W2 (2816, 1056) in bf16 ≈ 17.8 MB of
VMEM — fits v5e VMEM with room for the streamed tiles.

Reverse-mode: custom_vjp whose backward is a single fused pallas pass
(weight grads accumulated in fp32 VMEM across token tiles). Two backward
variants, routed by token count (_bwd_save_acts): up to
SWIFT_FFN_BWD_SAVE_MAX_TOKENS the fwd RULE emits gate/up and the backward
reads them from HBM (6 MXU matmuls — under per-pair remat the residuals
are live for one pair only); past it the backward recomputes gate/up in
VMEM (8 matmuls, zero extra HBM — the 0.25° memory regime, see
_ffn_bwd_kernel). Forward-mode (the sCM jvp branch):
``fused_swiglu_ffn(..., jvp=True)`` carries a custom_jvp whose rule is the
combined primal+tangent kernel; FeedForward routes jvp=True here only on
large grids (small grids measured faster on the jnp path — PERF.md ledger).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swift_tpu.ops import jvp_guard


def _ffn_kernel(x_ref, wg_ref, wu_ref, w2_ref, o_ref):
    x = x_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    o_ref[...] = jnp.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pick_block(T: int) -> int:
    for bt in (512, 256, 128):
        if T % bt == 0:
            return bt
    return 0


def _pick_block_small(T: int) -> int:
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if T % bt == 0:
            return bt
    return 0


def _ffn_call(x2, wg, wu, w2):
    T, D = x2.shape
    H = wg.shape[1]
    bt = _pick_block(T)
    grid = (T // bt,)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        # VMEM-resident weights (~18 MB) + double-buffered token tiles
        # exceed some programs' default scoped-vmem limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # weight blocks: index maps constant in i -> fetched once,
            # resident across every token tile.
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 3,
            bytes_accessed=(2 * T * D + 3 * D * H) * x2.dtype.itemsize,
            transcendentals=T * H,
        ),
    )(x2, wg, wu, w2)


def _ffn_fwd_save_kernel(x_ref, wg_ref, wu_ref, w2_ref,
                         o_ref, g_ref, u_ref):
    """Forward that also emits gate/up (bf16) for the saved-activation
    backward. Runs only inside a remat'd backward segment (the custom_vjp
    fwd rule), so the extra (T, H) outputs are live for one block pair at
    a time, not across the layer scan."""
    x = x_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    g_ref[...] = g.astype(g_ref.dtype)
    u_ref[...] = u.astype(u_ref.dtype)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    o_ref[...] = jnp.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _ffn_fwd_save_call(x2, wg, wu, w2):
    T, D = x2.shape
    H = wg.shape[1]
    bt = min(_pick_block(T), int(os.environ.get("SWIFT_FFN_BWD_BT", "512")))
    tok = lambda n: pl.BlockSpec((bt, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ffn_fwd_save_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        in_specs=[tok(D), const((D, H)), const((D, H)), const((H, D))],
        out_specs=[tok(D), tok(H), tok(H)],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            # saved in the compute dtype: bf16 in training (the kernels
            # compute g/u in fp32 and the bwd re-expands to fp32 — the
            # rounding matches the bf16 MXU noise everywhere else), fp32
            # for fp32 callers (exact).
            jax.ShapeDtypeStruct((T, H), x2.dtype),
            jax.ShapeDtypeStruct((T, H), x2.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 3,
            bytes_accessed=(2 * T * D + 3 * D * H) * x2.dtype.itemsize
            + 4 * T * H,
            transcendentals=T * H,
        ),
    )(x2, wg, wu, w2)


def _ffn_bwd_saved_kernel(x_ref, dy_ref, g_ref, u_ref, wg_ref, wu_ref,
                          w2_ref, dx_ref, dwg_ref, dwu_ref, dw2_ref):
    """FFN backward with gate/up read from HBM instead of recomputed: 6
    MXU matmuls vs the recompute kernel's 8. The extra (T, 2H) bf16 HBM
    read is ~1 ms/site at the flagship grid vs ~5 ms of saved matmul time
    (PERF.md r4 ledger)."""
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    g = g_ref[...].astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(g)
    sg = g * sig
    h = (sg * u).astype(x.dtype)
    dh = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = (dh * u * (sig * (1 + g * (1 - sig)))).astype(x.dtype)
    du = (dh * sg).astype(x.dtype)
    dx = (
        jax.lax.dot_general(dg, wg_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(du, wu_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dwg_c = jax.lax.dot_general(x, dg, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwu_c = jax.lax.dot_general(x, du, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(h, dy, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dwg_ref[...] = dwg_c
        dwu_ref[...] = dwu_c
        dw2_ref[...] = dw2_c

    @pl.when(i > 0)
    def _acc():
        dwg_ref[...] += dwg_c
        dwu_ref[...] += dwu_c
        dw2_ref[...] += dw2_c


def _ffn_bwd_saved_call(x2, dy2, g, u, wg, wu, w2):
    T, D = x2.shape
    H = wg.shape[1]
    bt = min(_pick_block(T), int(os.environ.get("SWIFT_FFN_BWD_BT", "512")))
    tok = lambda n: pl.BlockSpec((bt, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ffn_bwd_saved_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        in_specs=[tok(D), tok(D), tok(H), tok(H), const((D, H)),
                  const((D, H)), const((H, D))],
        out_specs=[tok(D), const((D, H)), const((D, H)), const((H, D))],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 6,
            bytes_accessed=(4 * T * D + 6 * D * H) * x2.dtype.itemsize
            + 4 * T * H,
            transcendentals=T * H,
        ),
    )(x2, dy2, g, u, wg, wu, w2)


def _bwd_save_acts(T: int) -> bool:
    """Saved-activation backward routing: ON up to a token budget. The
    (T, 2H) bf16 gate/up residuals are live for one remat'd block pair.
    Default 131072 tokens covers the 1.4° flagship train batch exactly
    (B=16 x 64x128 tokens; measured on chip: FFN bwd 236 -> 183 ms/site,
    train step 2.129 -> 2.029 s, PERF.md r4) while the 0.25° B=1 grid
    (364x720 = 262080 tokens), where the single-chip sCM fit has no
    slack, keeps the recompute kernel."""
    return T <= int(os.environ.get("SWIFT_FFN_BWD_SAVE_MAX_TOKENS", "131072"))


def _ffn_bwd_kernel(x_ref, dy_ref, wg_ref, wu_ref, w2_ref,
                    dx_ref, dwg_ref, dwu_ref, dw2_ref):
    """Full FFN backward in one pass: gate/up recomputed in VMEM, dx per
    token tile, weight grads ACCUMULATED in fp32 VMEM across the
    (sequential) token grid. Left to XLA the backward materializes ~9 GB of
    (tokens, 2816) intermediates at the 0.25° grid (r3 OOM table #1-#6);
    here nothing (tokens, H)-shaped ever reaches HBM."""
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(g)
    sg = g * sig
    h = (sg * u).astype(x.dtype)
    # dh = dy @ w2^T
    dh = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # d silu(g) = sigmoid(g) * (1 + g * (1 - sigmoid(g)))
    dg = (dh * u * (sig * (1 + g * (1 - sig)))).astype(x.dtype)
    du = (dh * sg).astype(x.dtype)
    dx = (
        jax.lax.dot_general(dg, wg_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(du, wu_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dwg_c = jax.lax.dot_general(x, dg, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwu_c = jax.lax.dot_general(x, du, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(h, dy, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dwg_ref[...] = dwg_c
        dwu_ref[...] = dwu_c
        dw2_ref[...] = dw2_c

    @pl.when(i > 0)
    def _acc():
        dwg_ref[...] += dwg_c
        dwu_ref[...] += dwu_c
        dw2_ref[...] += dw2_c


def _ffn_bwd_call(x2, dy2, wg, wu, w2):
    T, D = x2.shape
    H = wg.shape[1]
    # bt=512 measured FASTER than 256 (r4: FFN bwd 143 -> 158 TF/s,
    # -50 ms/step on the hd128 train step) — the fp32 weight-grad
    # accumulators (~36 MB) + weights (~18 MB) + six (bt, H) fp32 tile
    # intermediates still fit the 110 MB scoped budget at 512.
    bt = min(_pick_block(T), int(os.environ.get("SWIFT_FFN_BWD_BT", "512")))
    tok = lambda n: pl.BlockSpec((bt, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ffn_bwd_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        in_specs=[tok(D), tok(D), const((D, H)), const((D, H)),
                  const((H, D))],
        out_specs=[tok(D), const((D, H)), const((D, H)), const((H, D))],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 8,
            bytes_accessed=(4 * T * D + 6 * D * H) * x2.dtype.itemsize,
            transcendentals=T * H,
        ),
    )(x2, dy2, wg, wu, w2)


@jax.custom_vjp
def _fused_swiglu(x2, wg, wu, w2):
    return _ffn_call(x2, wg, wu, w2)


def _fused_swiglu_fwd(x2, wg, wu, w2):
    if _bwd_save_acts(x2.shape[0]):
        y, g, u = _ffn_fwd_save_call(x2, wg, wu, w2)
        return y, (x2, g, u, wg, wu, w2)
    return _ffn_call(x2, wg, wu, w2), (x2, None, None, wg, wu, w2)


def _fused_swiglu_bwd(res, dy):
    x2, g, u, wg, wu, w2 = res
    if g is None:
        dx, dwg, dwu, dw2 = _ffn_bwd_call(
            x2, dy.astype(x2.dtype), wg, wu, w2)
    else:
        dx, dwg, dwu, dw2 = _ffn_bwd_saved_call(
            x2, dy.astype(x2.dtype), g, u, wg, wu, w2)
    return (dx, dwg.astype(wg.dtype), dwu.astype(wu.dtype),
            dw2.astype(w2.dtype))


_fused_swiglu.defvjp(_fused_swiglu_fwd, _fused_swiglu_bwd)


# ---------------------------------------------------------------------------
# Forward-mode (sCM jvp) combined primal+tangent kernel.
#
# Under jax.jvp the jnp fallback materializes FOUR (tokens, H) intermediates
# in HBM (g, u, dg, du) on top of the primal's gate_up — the 0.25° memory
# cliff (PERF.md). The jvp rule below emits (y, dy) from ONE kernel with
# gate/up computed once and shared in VMEM:
#
#     dy = (silu'(g)·(dx@Wg)·u + silu(g)·(dx@Wu)) @ W2
#
# Routing (see FeedForward): large grids take this kernel for memory; the
# flagship 1.4° grid keeps the jnp jvp path, which measured faster there
# (XLA CSEs gate/up between primal and tangent — PERF.md r3 ledger).


def _ffn_pt_kernel(x_ref, dx_ref, wg_ref, wu_ref, w2_ref, o_ref, do_ref):
    """COMBINED primal+tangent: gate/up computed ONCE and shared between
    y and dy in VMEM — 6 matmuls total vs 3+5 for separate primal/tangent
    kernels (the tangent kernel recomputes g/u). PERF.md r4 lever (a)."""
    x = x_ref[...]
    dx = dx_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    dg = jnp.dot(dx, wg_ref[...], preferred_element_type=jnp.float32)
    du = jnp.dot(dx, wu_ref[...], preferred_element_type=jnp.float32)
    sig = jax.nn.sigmoid(g)
    sg = g * sig
    o_ref[...] = jnp.dot(
        (sg * u).astype(x.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    dh = (sig * (1 + g * (1 - sig))) * dg * u + sg * du
    do_ref[...] = jnp.dot(
        dh.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32
    ).astype(do_ref.dtype)


def _ffn_pt_call(x2, dx2, wg, wu, w2):
    T, D = x2.shape
    H = wg.shape[1]
    # six (bt, H) fp32 intermediates live per tile; 512 fits the scoped
    # budget (same ledger entry as _ffn_bwd_call's tile bump).
    bt = min(_pick_block(T), int(os.environ.get("SWIFT_FFN_PT_BT", "512")))
    tok = lambda: pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ffn_pt_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        in_specs=[tok(), tok(), const((D, H)), const((D, H)),
                  const((H, D))],
        out_specs=[tok(), tok()],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            jax.ShapeDtypeStruct((T, D), x2.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 6,
            bytes_accessed=(4 * T * D + 3 * D * H) * x2.dtype.itemsize,
            transcendentals=T * H,
        ),
    )(x2, dx2, wg, wu, w2)


@jax.custom_jvp
def _fused_swiglu_jvp_capable(x2, wg, wu, w2):
    """Same fused primal, plus a forward-mode rule (the sCM tangent path,
    reference loss.py:212-220 / swinv2.py:129's flash-disable dodge).

    Weight tangents are assumed zero: this entry is reached only from the
    sCM jvp forward, which differentiates w.r.t. (x, t) with the params
    closed over as constants (same contract as the attention kernel's
    ``_fba_jvp_capable``)."""
    return _ffn_call(x2, wg, wu, w2)


@functools.partial(_fused_swiglu_jvp_capable.defjvp, symbolic_zeros=True)
def _fused_swiglu_jvp_rule(primals, tangents):
    x2, wg, wu, w2 = primals
    dx2, dwg, dwu, dw2 = tangents
    jvp_guard.require_zero_tangents("fused_swiglu_ffn", wg=dwg, wu=dwu,
                                    w2=dw2)
    dx2 = jvp_guard.materialize(dx2)
    # one combined kernel for (y, dy): gate/up shared in VMEM. The sCM loss
    # stop_gradients both jvp-forward outputs (loss.py), so the primal
    # needs no vjp rule here.
    o, do = _ffn_pt_call(
        jax.lax.stop_gradient(x2),
        jax.lax.stop_gradient(dx2.astype(x2.dtype)),
        jax.lax.stop_gradient(wg),
        jax.lax.stop_gradient(wu),
        jax.lax.stop_gradient(w2),
    )
    return o, do


def fused_swiglu_ffn(x, w1, w2, jvp=False):
    """SwiGLU FFN with the pallas-fused forward.

    x: (..., D); w1: (D, 2H) with gate = w1[:, :H], up = w1[:, H:]
    (the reference chunk order, swinv2.py:99); w2: (H, D). Returns (..., D)
    in x.dtype. Falls back to the caller's jnp path via ValueError when the
    token count doesn't tile. With ``jvp=True`` the entry carries a
    forward-mode rule (fused tangent kernel) instead of the custom_vjp.
    """
    D = x.shape[-1]
    H2 = w1.shape[1]
    H = H2 // 2
    x2 = x.reshape(-1, D)
    if _pick_block(x2.shape[0]) == 0:
        raise ValueError(f"token count {x2.shape[0]} does not tile")
    wg = w1[:, :H].astype(x.dtype)
    wu = w1[:, H:].astype(x.dtype)
    fn = _fused_swiglu_jvp_capable if jvp else _fused_swiglu
    y = fn(x2, wg, wu, w2.astype(x.dtype))
    return y.reshape(x.shape)


def reference_swiglu_ffn(x, w1, w2):
    """jnp fallback: identical math, XLA-fused (materializes gate_up)."""
    gate_up = jnp.dot(x, w1.astype(x.dtype))
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jnp.dot(jax.nn.silu(gate) * up, w2.astype(x.dtype))


# ---------------------------------------------------------------------------
# int8 inference FFN (PERF.md lever (e)): the v5e MXU runs int8 x int8 ->
# int32 at 2x bf16 rate. Dynamic symmetric quantization — per-token
# activation scales computed IN the kernel (the fp activations never make
# a second HBM pass), per-column weight scales computed outside by the
# caller (loop-invariant -> hoisted out of the solver scan by XLA). The
# int8 weight set is ~8.9 MB VMEM (half of bf16). Inference-only: no
# vjp/jvp rules — the quantize round is not usefully differentiable.


def _ffn_q_kernel(x_ref, wgq_ref, wuq_ref, w2q_ref, sg_ref, su_ref, s2_ref,
                  o_ref):
    x = x_ref[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-30) * (
        1.0 / 127.0
    )
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    g = jax.lax.dot_general(
        xq, wgq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * sg_ref[...]
    u = jax.lax.dot_general(
        xq, wuq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * su_ref[...]
    h = jax.nn.silu(g) * u
    sh = jnp.maximum(jnp.max(jnp.abs(h), -1, keepdims=True), 1e-30) * (
        1.0 / 127.0
    )
    hq = jnp.clip(jnp.round(h / sh), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        hq, w2q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    o_ref[...] = (y * sh * s2_ref[...]).astype(o_ref.dtype)


def fused_swiglu_ffn_int8(x, w1, w2):
    """Dynamically-quantized int8 SwiGLU FFN (inference only).

    Same contract as ``fused_swiglu_ffn`` (x: (..., D); w1: (D, 2H) with
    gate|up halves; w2: (H, D)); raises ValueError when the token count
    doesn't tile. Numerics: tests/test_quant.py pins the kernel to the jnp
    mirror (``reference_swiglu_ffn_int8``) and the mirror to the fp path.
    """
    from swift_tpu.ops.quant import quantize_colwise

    D = x.shape[-1]
    H = w1.shape[1] // 2
    x2 = x.reshape(-1, D)
    T = x2.shape[0]
    bt = _pick_block(T)
    if bt == 0:
        raise ValueError(f"token count {T} does not tile")
    wgq, sg = quantize_colwise(w1[:, :H])
    wuq, su = quantize_colwise(w1[:, H:])
    w2q, s2 = quantize_colwise(w2)
    tok = lambda: pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _ffn_q_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[tok(), const((D, H)), const((D, H)), const((H, D)),
                  const((1, H)), const((1, H)), const((1, D))],
        out_specs=tok(),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 3,
            bytes_accessed=(2 * T * D * x.dtype.itemsize + 3 * D * H),
            transcendentals=T * H,
        ),
    )(x2, wgq, wuq, w2q, sg, su, s2)
    return y.reshape(x.shape)


def reference_swiglu_ffn_int8(x, w1, w2):
    """jnp mirror of the int8 kernel: same quantization points, XLA ops.
    The CPU/fallback path for ``quant="int8"`` and the numerics oracle for
    the kernel test."""
    from swift_tpu.ops.quant import int8_matmul

    H = w1.shape[1] // 2
    g = int8_matmul(x, w1[:, :H])
    u = int8_matmul(x, w1[:, H:])
    h = jax.nn.silu(g) * u
    return int8_matmul(h, w2).astype(x.dtype)


# ---------------------------------------------------------------------------
# FFN + post-norm epilogue: x + (LN(ffn(x))·g + b)·(1+scale) + shift in one
# kernel — the FFN output never reaches HBM (the block's residual source IS
# the FFN input, so the x tile serves both roles).


def _ffn_mn_kernel(x_ref, wg_ref, wu_ref, w2_ref, g_ref, b_ref, ms_ref,
                   mb_ref, o_ref, *, eps):
    x = x_ref[...]
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu_ref[...], preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(y * y, -1, keepdims=True) - mu * mu
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    ln = yn * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out = ln * (1.0 + ms_ref[0, 0].astype(jnp.float32)) + mb_ref[0, 0].astype(
        jnp.float32
    )
    o_ref[...] = (out + x.astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_mn_call(x2, wg, wu, w2, g, b, msc, msh, eps, tps):
    T, D = x2.shape
    H = wg.shape[1]
    bt = _pick_block_small(math.gcd(T, tps))
    per = tps // bt
    tok = lambda: pl.BlockSpec((bt, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    mod = lambda: pl.BlockSpec((1, 1, D), lambda i: (i // per, 0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_mn_kernel, eps=eps),
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[tok(), const((D, H)), const((D, H)), const((H, D)),
                  const((1, D)), const((1, D)), mod(), mod()],
        out_specs=tok(),
        out_shape=jax.ShapeDtypeStruct((T, D), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * H * 3 + 10 * T * D,
            bytes_accessed=(2 * T * D + 3 * D * H) * x2.dtype.itemsize,
            transcendentals=T * H,
        ),
    )(x2, wg, wu, w2, g.reshape(1, D), b.reshape(1, D),
      msc.reshape(-1, 1, D), msh.reshape(-1, 1, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_swiglu_mn(x2, wg, wu, w2, g, b, msc, msh, eps, tps):
    return _ffn_mn_call(x2, wg, wu, w2, g, b, msc, msh, eps, tps)


def _fused_swiglu_mn_fwd(x2, wg, wu, w2, g, b, msc, msh, eps, tps):
    out = _ffn_mn_call(x2, wg, wu, w2, g, b, msc, msh, eps, tps)
    return out, (x2, wg, wu, w2, g, b, msc, msh)


def _fused_swiglu_mn_bwd(eps, tps, res, dy):
    x2, wg, wu, w2, g, b, msc, msh = res
    from swift_tpu.ops.pallas_modnorm import reference_modnorm_residual

    B = msc.shape[0]
    per = x2.shape[0] // B

    def ref(x2, wg, wu, w2, g, b, msc, msh):
        y = reference_swiglu_ffn(x2, jnp.concatenate([wg, wu], -1), w2)
        y = y.reshape(B, per, -1)
        r = x2.reshape(B, per, -1)
        return reference_modnorm_residual(y, r, g, b, msc, msh, eps).reshape(
            x2.shape
        )

    _, vjp = jax.vjp(ref, x2, wg, wu, w2, g, b, msc, msh)
    return vjp(dy)


_fused_swiglu_mn.defvjp(_fused_swiglu_mn_fwd, _fused_swiglu_mn_bwd)


def fused_swiglu_ffn_modnorm(x, w1, w2, g, b, mod_scale, mod_shift, eps=1e-6):
    """``x + modnorm(SwiGLU_FFN(x))`` — the full post-norm FFN block arm in
    one kernel. Args as fused_swiglu_ffn + the LN affine params (D,) and
    per-sample AdaLN rows (B, D). Raises ValueError when shapes don't tile.
    """
    B = x.shape[0]
    D = x.shape[-1]
    H2 = w1.shape[1]
    H = H2 // 2
    tps = 1
    for s in x.shape[1:-1]:
        tps *= s
    x2 = x.reshape(-1, D)
    if _pick_block_small(math.gcd(x2.shape[0], tps)) == 0:
        raise ValueError(f"token count {x2.shape[0]} does not tile")
    wg = w1[:, :H].astype(x.dtype)
    wu = w1[:, H:].astype(x.dtype)
    out = _fused_swiglu_mn(
        x2, wg, wu, w2.astype(x.dtype), g, b,
        mod_scale.astype(x.dtype), mod_shift.astype(x.dtype), eps, tps,
    )
    return out.reshape(x.shape)
