"""Window partition / reverse and cyclic shift for Swin-style attention.

Semantics match the reference Swin windowing (reference:
src/swift/models/swinv2.py:17-41, torch NCHW) but are expressed
channels-last (NHWC) and keep the batch dimension separate from the window
dimension — ``(B, H, W, C) -> (B, nW, n, C)`` — so that per-sample
conditioning broadcasts over windows with zero data movement instead of a
``repeat_interleave`` (reference swinv2.py:181-184).

All reshapes/transposes here compile to XLA ``reshape``/``transpose`` which
fuse into the surrounding computation; there is no copy on TPU for the
partition itself (the transpose is folded into the next matmul's layout).
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, num_windows, wh*ww, C)."""
    B, H, W, C = x.shape
    wh, ww = window_size
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nh, nw, wh, ww, C
    return x.reshape(B, (H // wh) * (W // ww), wh * ww, C)


def window_reverse(
    windows: jnp.ndarray, window_size: tuple[int, int], img_size: tuple[int, int]
) -> jnp.ndarray:
    """(B, num_windows, wh*ww, C) -> (B, H, W, C)."""
    H, W = img_size
    wh, ww = window_size
    B = windows.shape[0]
    C = windows.shape[-1]
    x = windows.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nh, wh, nw, ww, C
    return x.reshape(B, H, W, C)


def cyclic_shift(x: jnp.ndarray, shift: tuple[int, int]) -> jnp.ndarray:
    """Cyclic shift on the two spatial dims of (B, H, W, C).

    Positive values roll content toward larger indices (same convention as
    ``torch.roll`` used at reference swinv2.py:193-194,207-208).
    """
    sh, sw = shift
    if sh == 0 and sw == 0:
        return x
    return jnp.roll(x, shift=(sh, sw), axis=(1, 2))
