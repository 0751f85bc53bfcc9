"""Pallas fused linear projection (TPU) — the qkv matmul's kernel.

Why this exists: in the sCM jvp-forward and remat'd-backward programs XLA
lowers the qkv ``x @ W`` through convolution-style emitters chosen per
fusion context; pinning the matmul to a pallas_call (opaque to the fusion
pass) holds every context at the kernel's ~170-180 TF/s and fetches the
weight block once per program. Measured r4 on the hd128 train step:
2245 -> 2202 ms (then -> 2152 with the 512 tile bump) — a modest, stable
win; a bare 2D-reshape of the dot measured NEUTRAL (XLA re-canonicalizes
it into the same fusions).

Same structure as pallas_ffn: weights VMEM-resident (constant index maps),
token tiles streamed, fp32 accumulation, weight-grad accumulated in fp32
VMEM across the sequential token grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swift_tpu.ops import jvp_guard
from swift_tpu.ops.pallas_ffn import _pick_block


def _lin_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _lin_call(x2, w):
    T, D = x2.shape
    N = w.shape[1]
    bt = _pick_block(T)
    return pl.pallas_call(
        _lin_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * N,
            bytes_accessed=(T * (D + N) + D * N) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, w)


def _lin_bwd_kernel(dy_ref, x_ref, w_ref, dx_ref, dw_ref):
    i = pl.program_id(0)
    dy = dy_ref[...]
    # dx = dy @ w^T
    dx_ref[...] = jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    # dw += x^T @ dy, accumulated fp32 across the sequential token grid
    dw_c = jax.lax.dot_general(
        x_ref[...], dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = dw_c

    @pl.when(i > 0)
    def _acc():
        dw_ref[...] += dw_c


def _lin_bwd_call(dy2, x2, w):
    T, D = x2.shape
    N = w.shape[1]
    bt = min(_pick_block(T), 512)
    return pl.pallas_call(
        _lin_bwd_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((bt, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D), x2.dtype),
            jax.ShapeDtypeStruct((D, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * N * 2,
            bytes_accessed=(2 * T * (D + N) + 2 * D * N) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(dy2, x2, w)


@jax.custom_vjp
def _fused_linear(x2, w):
    return _lin_call(x2, w)


def _fused_linear_fwd(x2, w):
    return _lin_call(x2, w), (x2, w)


def _fused_linear_bwd(res, dy):
    x2, w = res
    dx, dw = _lin_bwd_call(dy.astype(x2.dtype), x2, w)
    return dx, dw.astype(w.dtype)


_fused_linear.defvjp(_fused_linear_fwd, _fused_linear_bwd)


def _lin_pt_kernel(x_ref, dx_ref, w_ref, o_ref, do_ref):
    """Combined primal+tangent: the weight block is fetched once for both
    matmuls (the jvp-forward's qkv pair)."""
    w = w_ref[...]
    o_ref[...] = jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    do_ref[...] = jnp.dot(
        dx_ref[...], w, preferred_element_type=jnp.float32
    ).astype(do_ref.dtype)


def _lin_pt_call(x2, dx2, w):
    T, D = x2.shape
    N = w.shape[1]
    bt = min(_pick_block(T), 512)
    tok = lambda n: pl.BlockSpec((bt, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lin_pt_kernel,
        grid=(T // bt,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[tok(D), tok(D),
                  pl.BlockSpec((D, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[tok(N), tok(N)],
        out_shape=[
            jax.ShapeDtypeStruct((T, N), x2.dtype),
            jax.ShapeDtypeStruct((T, N), x2.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * N * 2,
            bytes_accessed=(2 * T * (D + N) + D * N) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, dx2, w)


@jax.custom_jvp
def _fused_linear_jvp_capable(x2, w):
    """Same fused primal with a forward-mode rule. Weight tangents are
    assumed zero — reached only from the sCM jvp forward, which
    differentiates w.r.t. (x, t) with params closed over (the same
    contract as the FFN/attention jvp entries)."""
    return _lin_call(x2, w)


@functools.partial(_fused_linear_jvp_capable.defjvp, symbolic_zeros=True)
def _fused_linear_jvp_rule(primals, tangents):
    x2, w = primals
    dx2, dw = tangents
    jvp_guard.require_zero_tangents("fused_linear", w=dw)
    dx2 = jvp_guard.materialize(dx2)
    # sCM stop_gradients both jvp outputs, so no vjp rule needed here
    return _lin_pt_call(
        jax.lax.stop_gradient(x2),
        jax.lax.stop_gradient(dx2.astype(x2.dtype)),
        jax.lax.stop_gradient(w),
    )


def fused_linear(x, w, jvp: bool = False):
    """``x @ w`` with the matmul pinned to a pallas kernel in every program
    context (primal, jvp-forward, remat'd backward).

    x: (..., D); w: (D, N). Returns (..., N) in x.dtype. Raises ValueError
    when the token count doesn't tile (caller falls back to jnp).
    """
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    if _pick_block(x2.shape[0]) == 0:
        raise ValueError(f"token count {x2.shape[0]} does not tile")
    fn = _fused_linear_jvp_capable if jvp else _fused_linear
    y = fn(x2, w.astype(x.dtype))
    return y.reshape(*x.shape[:-1], w.shape[1])
