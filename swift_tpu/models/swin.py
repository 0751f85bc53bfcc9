"""Swin v1 backbone — pre-norm RMSNorm variant with axial 2D RoPE.

Behavioral parity with the reference Swin (reference:
src/swift/models/swin.py:433-549):

  * sinusoidal 2D absolute positional encoding added to the RAW input
    channels (:161-196, :537);
  * conv patch embedding (:395-405);
  * pre-norm blocks with ModulatedRMSNorm (RMSNorm + bias-free AdaLN
    modulation, :148-158) — note: modulation is applied BEFORE attention /
    feed-forward here, unlike SwinV2's post-norm;
  * axial 2D rotary embeddings per window (:199-259): rope_dim = head_dim//2,
    frequencies over x then y window coordinates;
  * standard 1/sqrt(head_dim)-scaled softmax attention (:278-314);
  * output head with pre-norm (:408-425);
  * "Spike No More" init: sigma = sqrt(2/5d), output projections scaled by
    sqrt(1/2L) (:502-519).

Channels-last NHWC, same TPU conventions as swinv2.py.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from swift_tpu.ops.embeddings import timestep_embedding
from swift_tpu.ops.windows import cyclic_shift, window_partition, window_reverse

Dtype = Any


def positional_encoding_2d(h: int, w: int, channels: int, max_positions: int = 10_000):
    """Sinusoidal 2D APE over (H, W, C) — reference swin.py:161-196."""
    ch = int(math.ceil(channels / 4) * 2)
    inv_freq = 1.0 / (
        max_positions ** (np.arange(0, ch, 2, dtype=np.float64) / ch)
    )

    def emb1d(n):
        sin_inp = np.arange(n, dtype=np.float64)[:, None] * inv_freq[None]
        e = np.stack([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
        return e.reshape(n, -1)  # (n, ch)

    emb_x = np.broadcast_to(emb1d(h)[:, None, :], (h, w, ch))
    emb_y = np.broadcast_to(emb1d(w)[None, :, :], (h, w, ch))
    emb = np.concatenate([emb_x, emb_y], axis=-1)[..., :channels]
    return jnp.asarray(emb, jnp.float32)  # (H, W, C)


def rope2d_cache(window_size: tuple[int, int], rope_dim: int, base: int = 10_000):
    """Axial 2D RoPE cos/sin cache over window positions
    (reference swin.py:217-243). Returns (n, rope_dim, 2) with the first
    rope_dim//2 frequency slots keyed on x and the rest on y."""
    wh, ww = window_size
    theta = 1.0 / (
        base ** (np.arange(0, rope_dim, 2, dtype=np.float64)[: rope_dim // 2] / rope_dim)
    )
    idx = np.arange(wh * ww, dtype=np.float64)
    x_pos, y_pos = idx % ww, idx // ww
    x_theta = x_pos[:, None] * theta[None]
    y_theta = y_pos[:, None] * theta[None]
    freqs = np.concatenate([x_theta, y_theta], axis=-1)  # (n, rope_dim)
    cache = np.stack([np.cos(freqs), np.sin(freqs)], axis=-1)
    return jnp.asarray(cache, jnp.float32)  # (n, rope_dim, 2)


def apply_rope2d(x: jnp.ndarray, cache: jnp.ndarray) -> jnp.ndarray:
    """x: (..., n, d) with d = 2 * rope_dim; pairs rotated by cache
    (reference swin.py:245-259)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = cache[..., 0]
    sin = cache[..., 1]
    out = jnp.stack(
        [
            xf[..., 0] * cos - xf[..., 1] * sin,
            xf[..., 1] * cos + xf[..., 0] * sin,
        ],
        axis=-1,
    )
    return out.reshape(x.shape).astype(dtype)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones_init(), (self.dim,))
        xf = x.astype(jnp.float32)
        out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return out.astype(x.dtype) * w


class ModulatedRMSNorm(nn.Module):
    """Pre-norm RMSNorm + bias-free AdaLN (reference swin.py:148-158)."""

    dim: int
    dtype: Dtype = jnp.bfloat16
    sigma: float = 0.02

    @nn.compact
    def __call__(self, x, t):
        x = RMSNorm(self.dim, name="norm")(x)
        mod = nn.Dense(
            2 * self.dim,
            use_bias=False,
            kernel_init=nn.initializers.normal(self.sigma),
            dtype=self.dtype,
            name="modulation",
        )(t)
        scale, shift = jnp.split(mod, 2, axis=-1)
        extra = x.ndim - scale.ndim
        scale = scale.reshape(scale.shape[0], *(1,) * extra, scale.shape[-1])
        shift = shift.reshape(shift.shape[0], *(1,) * extra, shift.shape[-1])
        return x * (1 + scale) + shift


class SwinV1Block(nn.Module):
    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: tuple[int, int]
    grid_size: tuple[int, int]
    shift: tuple[int, int]
    sigma: float
    out_scale: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t):
        gh, gw = self.grid_size
        B, N, D = x.shape
        inner = self.heads * self.head_dim
        normal = nn.initializers.normal
        xp = x

        # ---- attention (pre-norm, RoPE, 1/sqrt(d) scaling)
        z = x.reshape(B, gh, gw, D)
        sh, sw = self.shift
        if sh or sw:
            z = cyclic_shift(z, (-sh, -sw))
        z = window_partition(z, self.window_size)  # (B, nW, n, D)
        z = ModulatedRMSNorm(self.dim, dtype=self.dtype, sigma=self.sigma,
                             name="attn_norm")(z, t)
        qkv = nn.Dense(inner * 3, use_bias=False,
                       kernel_init=normal(self.sigma), dtype=self.dtype,
                       name="to_qkv")(z)
        Bq, nW, n, _ = qkv.shape
        qkv = qkv.reshape(Bq, nW, n, self.heads, 3 * self.head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cache = rope2d_cache(self.window_size, self.head_dim // 2)
        q = apply_rope2d(q.swapaxes(2, 3), cache).swapaxes(2, 3)
        k = apply_rope2d(k.swapaxes(2, 3), cache).swapaxes(2, 3)

        attn = jnp.einsum(
            "bwnhd,bwmhd->bwhnm",
            (q * self.head_dim**-0.5).astype(self.dtype),
            k.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bwhnm,bwmhd->bwnhd", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.reshape(Bq, nW, n, inner)
        out = nn.Dense(self.dim, use_bias=False,
                       kernel_init=normal(self.sigma * self.out_scale),
                       dtype=self.dtype, name="wo")(out)
        out = window_reverse(out, self.window_size, self.grid_size)
        if sh or sw:
            out = cyclic_shift(out, (sh, sw))
        x = xp + out.reshape(B, N, D)

        # ---- feed-forward (pre-norm SwiGLU)
        h = ModulatedRMSNorm(self.dim, dtype=self.dtype, sigma=self.sigma,
                             name="ff_norm")(x, t)
        gate_up = nn.Dense(2 * self.mlp_dim, use_bias=False,
                           kernel_init=normal(self.sigma), dtype=self.dtype,
                           name="w1")(h)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        h = nn.Dense(self.dim, use_bias=False,
                     kernel_init=normal(self.sigma * self.out_scale),
                     dtype=self.dtype, name="w2")(jax.nn.silu(gate) * up)
        return x + h


class Swin(nn.Module):
    """Swin v1 (RoPE variant). Same NHWC call contract as SwinV2."""

    img_resolution: Sequence[int]
    in_channels: int
    out_channels: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    patch_size: Sequence[int]
    depth: int = 6
    dim: int = 512
    heads: int = 12
    head_dim: int = 64
    mlp_dim: int = 512
    rope_base: int = 10_000
    auxiliary_dim: int = 0
    logvar: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t, auxiliary=None, jvp: bool = False,
                 return_logvar: bool = False):
        H, W = tuple(self.img_resolution)
        ph, pw = tuple(self.patch_size)
        gh, gw = H // ph, W // pw
        B = x.shape[0]
        sigma = math.sqrt(2.0 / (5 * self.dim))
        out_scale = math.sqrt(1.0 / (2 * self.depth))

        # APE on raw channels (reference swin.py:537), then conv patch embed.
        x = x + positional_encoding_2d(H, W, self.in_channels).astype(x.dtype)
        h = nn.Conv(
            self.dim, kernel_size=(ph, pw), strides=(ph, pw), padding="VALID",
            kernel_init=nn.initializers.normal(sigma), dtype=self.dtype,
            name="patch_embed",
        )(x)
        h = h.reshape(B, gh * gw, self.dim)

        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (B,))
        elif t.shape[0] == 1 and B > 1:
            t = jnp.broadcast_to(t, (B,))
        emb = timestep_embedding(t, self.dim)
        if self.auxiliary_dim and auxiliary is not None:
            aux = jnp.asarray(auxiliary, jnp.float32).reshape(B, self.auxiliary_dim)
            emb = emb + nn.Dense(
                self.dim, kernel_init=nn.initializers.normal(sigma),
                dtype=jnp.float32, name="auxiliary_embed",
            )(aux * math.sqrt(self.auxiliary_dim))
        e = nn.Dense(self.dim, kernel_init=nn.initializers.normal(sigma),
                     dtype=jnp.float32, name="latent_l1")(emb)
        e = nn.Dense(self.dim, kernel_init=nn.initializers.normal(sigma),
                     dtype=jnp.float32, name="latent_l2")(jax.nn.silu(e))
        cond = jax.nn.silu(e)
        cond_c = cond.astype(self.dtype)

        sh, sw = tuple(self.shift_size)
        for i in range(self.depth):
            shift = (sh, sw) if (sh or sw) and i % 2 != 0 else (0, 0)
            h = SwinV1Block(
                dim=self.dim, heads=self.heads, head_dim=self.head_dim,
                mlp_dim=self.mlp_dim, window_size=tuple(self.window_size),
                grid_size=(gh, gw), shift=shift, sigma=sigma,
                out_scale=out_scale, dtype=self.dtype, name=f"block{i}",
            )(h, cond_c)

        # output head: pre-norm + linear unpatchify (reference swin.py:408-425)
        h = ModulatedRMSNorm(self.dim, dtype=self.dtype, sigma=sigma,
                             name="head_norm")(h, cond_c)
        o = nn.Dense(
            self.out_channels * ph * pw, use_bias=False,
            kernel_init=nn.initializers.normal(sigma), dtype=self.dtype,
            name="head",
        )(h)
        o = o.reshape(B, gh, gw, self.out_channels, ph, pw)
        o = o.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, self.out_channels)
        return o.astype(jnp.float32)
