"""Unit tests for window ops and embeddings (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_tpu.ops import window_partition, window_reverse, cyclic_shift
from swift_tpu.ops.embeddings import timestep_embedding


def test_window_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16, 3)), jnp.float32)
    w = window_partition(x, (4, 4))
    assert w.shape == (2, 2 * 4, 16, 3)
    back = window_reverse(w, (4, 4), (8, 16))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_layout():
    # windows enumerate row-major over the (H/wh, W/ww) grid and contain
    # contiguous row-major patches.
    H, W, wh, ww = 4, 6, 2, 3
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    w = window_partition(x, (wh, ww))
    # window 0 = rows 0-1, cols 0-2
    np.testing.assert_array_equal(
        np.asarray(w[0, 0, :, 0]), np.array([0, 1, 2, 6, 7, 8], np.float32)
    )
    # window 1 = rows 0-1, cols 3-5
    np.testing.assert_array_equal(
        np.asarray(w[0, 1, :, 0]), np.array([3, 4, 5, 9, 10, 11], np.float32)
    )


def test_cyclic_shift_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 2)), jnp.float32)
    y = cyclic_shift(cyclic_shift(x, (-3, -2)), (3, 2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_timestep_embedding_matches_torch_reference_semantics():
    """Golden check of the sin/cos flip against a straight numpy transcription
    of the reference formula (src/swift/models/swinv2.py:44-60)."""
    import math

    t = np.array([0.3, 1.7, 100.0], np.float32)
    dim = 8
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    ref = ref.reshape(len(t), 2, -1)[:, ::-1, :].reshape(len(t), dim)

    out = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=1e-5)
    # flip means sin block comes first
    np.testing.assert_allclose(out[:, :half], np.sin(args), rtol=3e-5, atol=1e-5)


def test_timestep_embedding_odd_dim():
    out = timestep_embedding(jnp.ones((2,)), 7)
    assert out.shape == (2, 7)
