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

Reverse-mode: custom_vjp whose backward recomputes gate/up with plain XLA
einsums (the same expressions autodiff of the jnp path produces).
Forward-mode (the sCM jvp branch) does NOT use this kernel — FeedForward
routes jvp=True through the jnp path, mirroring the attention split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


@jax.custom_vjp
def _fused_swiglu(x2, wg, wu, w2):
    return _ffn_call(x2, wg, wu, w2)


def _fused_swiglu_fwd(x2, wg, wu, w2):
    return _ffn_call(x2, wg, wu, w2), (x2, wg, wu, w2)


def _fused_swiglu_bwd(res, dy):
    x2, wg, wu, w2 = res
    mm = x2.dtype
    g = jnp.dot(x2, wg, preferred_element_type=jnp.float32)
    u = jnp.dot(x2, wu, preferred_element_type=jnp.float32)
    sg = jax.nn.silu(g)
    h = (sg * u).astype(mm)
    dh = jnp.dot(dy.astype(mm), w2.T.astype(mm),
                 preferred_element_type=jnp.float32)
    dw2 = jnp.dot(h.T, dy.astype(mm), preferred_element_type=jnp.float32)
    # d silu(g) = sigmoid(g) * (1 + g * (1 - sigmoid(g)))
    sig = jax.nn.sigmoid(g)
    dg = dh * u * (sig * (1 + g * (1 - sig)))
    du = dh * sg
    dx = (
        jnp.dot(dg.astype(mm), wg.T.astype(mm),
                preferred_element_type=jnp.float32)
        + jnp.dot(du.astype(mm), wu.T.astype(mm),
                  preferred_element_type=jnp.float32)
    )
    dwg = jnp.dot(x2.T, dg.astype(mm), preferred_element_type=jnp.float32)
    dwu = jnp.dot(x2.T, du.astype(mm), preferred_element_type=jnp.float32)
    return (dx.astype(x2.dtype), dwg.astype(wg.dtype),
            dwu.astype(wu.dtype), dw2.astype(w2.dtype))


_fused_swiglu.defvjp(_fused_swiglu_fwd, _fused_swiglu_bwd)


def fused_swiglu_ffn(x, w1, w2):
    """SwiGLU FFN with the pallas-fused forward.

    x: (..., D); w1: (D, 2H) with gate = w1[:, :H], up = w1[:, H:]
    (the reference chunk order, swinv2.py:99); w2: (H, D). Returns (..., D)
    in x.dtype. Falls back to the caller's jnp path via ValueError when the
    token count doesn't tile.
    """
    D = x.shape[-1]
    H2 = w1.shape[1]
    H = H2 // 2
    x2 = x.reshape(-1, D)
    if _pick_block(x2.shape[0]) == 0:
        raise ValueError(f"token count {x2.shape[0]} does not tile")
    wg = w1[:, :H].astype(x.dtype)
    wu = w1[:, H:].astype(x.dtype)
    y = _fused_swiglu(x2, wg, wu, w2.astype(x.dtype))
    return y.reshape(x.shape)


def reference_swiglu_ffn(x, w1, w2):
    """jnp fallback: identical math, XLA-fused (materializes gate_up)."""
    gate_up = jnp.dot(x, w1.astype(x.dtype))
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jnp.dot(jax.nn.silu(gate) * up, w2.astype(x.dtype))
