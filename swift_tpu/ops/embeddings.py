"""Timestep / positional embeddings.

``timestep_embedding`` reproduces the reference's sinusoidal embedding with
the EDM sin/cos interleave-flip (reference: src/swift/models/swinv2.py:44-60)
— golden-value parity with the released checkpoints depends on that flip.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10_000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings with EDM-style sin/cos flip.

    Args:
      t: (B,) timesteps (any float dtype).
      dim: embedding dimension.

    Returns:
      (B, dim) embedding in ``t.dtype``.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    ).astype(t.dtype)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    # EDM flip: view as (B, 2, dim//2), reverse the pair axis -> sin first.
    emb = jnp.flip(emb.reshape(emb.shape[0], 2, -1), axis=1).reshape(emb.shape)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
