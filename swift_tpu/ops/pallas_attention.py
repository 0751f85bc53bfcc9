"""Pallas fused cosine window-attention (TPU).

The hot op of the flagship model (SURVEY.md §7.2 step 9): windowed cosine
attention over 256-token windows (reference semantics:
src/swift/models/swinv2.py:105-139 — L2-normalized q/k, learned per-head
logit scale, softmax at scale 1.0).

Because a Swin window is only wh*ww = 256 tokens, the whole (n × n) logits
tile fits in VMEM: this is a *fused* attention (normalize + QK^T + softmax +
PV in one kernel, logits never touch HBM), not an online-softmax flash
kernel. One grid program handles one (batch·window) slice with ALL heads,
using batched MXU matmuls over the head axis.

Forward + custom_vjp backward are Pallas kernels. The sCM JVP path uses the
plain jnp attention instead (same policy as the reference, which disables
flash under forward-mode AD, swinv2.py:129).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _normalize(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def _attn_fwd_kernel(scale_ref, q_ref, k_ref, v_ref, o_ref):
    # blocks: q/k/v (1, h, n, d); scale (h,) in SMEM-like small VMEM
    q = q_ref[0].astype(jnp.float32)  # (h, n, d)
    k = k_ref[0].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)  # (h,)

    qn = _normalize(q) * scale[:, None, None]
    kn = _normalize(k)

    s = jax.lax.dot_general(
        qn.astype(jnp.bfloat16),
        kn.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, n, n)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, n, d)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_fwd(q, k, v, scale):
    BW, h, n, d = q.shape
    kernel = pl.pallas_call(
        _attn_fwd_kernel,
        grid=(BW,),
        in_specs=[
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BW * h * (2 * n * n * d),
            bytes_accessed=4 * BW * h * n * d * 4,
            transcendentals=BW * h * n * n,
        ),
    )
    return kernel(scale, q, k, v)


def _attn_bwd_kernel(scale_ref, q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dscale_ref):
    q = q_ref[0].astype(jnp.float32)  # (h, n, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)

    q_sq = jnp.sum(q * q, axis=-1, keepdims=True) + _EPS
    k_sq = jnp.sum(k * k, axis=-1, keepdims=True) + _EPS
    q_inv = jax.lax.rsqrt(q_sq)
    k_inv = jax.lax.rsqrt(k_sq)
    qh = q * q_inv  # unit q
    kh = k * k_inv  # unit k
    qn = qh * scale[:, None, None]

    s = jax.lax.dot_general(
        qn.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # dv = p^T @ do
    dv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp = do @ v^T
    dp = jax.lax.dot_general(
        do.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # softmax backward: ds = p * (dp - sum(p*dp))
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))

    # d(qn) = ds @ kh ; d(kh) = ds^T @ qn
    dqn = jax.lax.dot_general(
        ds.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dkh = jax.lax.dot_general(
        ds.astype(jnp.bfloat16), qn.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # through the scale: qn = qh * scale
    dqh = dqn * scale[:, None, None]
    dscale = jnp.sum(dqn * qh, axis=(1, 2))  # (h,)

    # through L2 normalization: x_hat = x / ||x||;
    # dx = (dxhat - x_hat * sum(dxhat * x_hat)) / ||x||
    dq = (dqh - qh * jnp.sum(dqh * qh, axis=-1, keepdims=True)) * q_inv
    dk = (dkh - kh * jnp.sum(dkh * kh, axis=-1, keepdims=True)) * k_inv

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dscale_ref[0] = dscale.astype(dscale_ref.dtype)


def _attn_bwd(scale, q, k, v, do):
    BW, h, n, d = q.shape
    kernel = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(BW,),
        in_specs=[
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((BW, h), jnp.float32),
        ],
    )
    dq, dk, dv, dscale_per = kernel(scale, q, k, v, do)
    return dq, dk, dv, dscale_per.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_window_attention(q, k, v, scale):
    """Cosine attention, fused. q/k/v: (BW, h, n, d); scale: (h,) —
    the already-exp'ed, clamped per-head logit scale."""
    return _attn_fwd(q, k, v, scale)


def _fwa_fwd(q, k, v, scale):
    o = _attn_fwd(q, k, v, scale)
    return o, (q, k, v, scale)


def _fwa_bwd(res, do):
    q, k, v, scale = res
    dq, dk, dv, dscale = _attn_bwd(scale, q, k, v, do)
    return dq, dk, dv, dscale


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def reference_window_attention(q, k, v, scale):
    """jnp fallback (and forward-mode-AD path): identical math, XLA-fused.

    Matmul inputs stay in the caller's compute dtype (bf16 in production,
    fp32 in golden-parity tests) with fp32 accumulation.
    """
    mm_dtype = v.dtype
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    qn = _normalize(q) * scale.astype(jnp.float32)[None, :, None, None]
    kn = _normalize(k)
    s = jnp.einsum(
        "bhnd,bhmd->bhnm",
        qn.astype(mm_dtype),
        kn.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd",
        p.astype(mm_dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
