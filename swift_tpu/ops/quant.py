"""Dynamic int8 quantization for the inference matmul path.

The v5e MXU runs int8 x int8 -> int32 at 2x bf16 throughput (PERF.md lever
(e)). The scheme here is standard dynamic symmetric quantization:

  * weights: per-output-column scales, |W[:, j]|_max / 127 (computed inside
    the jitted forward with jnp — loop-invariant w.r.t. the solver scan, so
    XLA hoists it out of the rollout loop);
  * activations: per-row (per-token) scales computed on the fly — inside
    the Pallas kernel for the fused FFN, as a fused jnp prologue for the
    qkv projection;
  * accumulate int32, rescale fp32 by the scale outer product.

Inference-only and opt-in (``SwinV2.quant="int8"``): the training paths and
the parity configs stay bf16/fp32. The reference has no quantized path at
all (torch eager bf16 AMP, reference src/swift/training/trainer.py:219).
Accuracy is gated by tests/test_quant.py (forecast-level RMSE vs the fp
path) — keep it a flag until a real-data RMSE/CRPS A/B blesses it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-30


def quantize_rowwise(x: jnp.ndarray):
    """(..., K) fp -> (int8 values, fp32 scales (..., 1)): symmetric
    per-row abs-max."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_colwise(w: jnp.ndarray):
    """(K, N) fp -> (int8 values, fp32 scales (1, N)): symmetric
    per-output-column abs-max."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Dynamically-quantized ``x @ w`` -> fp32.

    x: (..., K); w: (K, N). Both quantized on the fly (per-row / per-column
    scales). On TPU, XLA lowers the int8 dot to the MXU's 2x-rate path and
    fuses the quantize/rescale elementwise chains.
    """
    lead = x.shape[:-1]
    xq, sx = quantize_rowwise(x.reshape(-1, x.shape[-1]))
    wq, sw = quantize_colwise(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sx * sw).reshape(*lead, w.shape[1])
