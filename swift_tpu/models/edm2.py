"""EDM2 magnitude-preserving U-Net, TPU-native NHWC.

Behavioral parity with the reference (reference: src/swift/models/edm2.py):

  * ``normalize`` / ``mp_silu`` / ``mp_sum`` / ``mp_cat`` magnitude-
    preserving primitives (:15-74);
  * ``MPFourier`` features with the sCM-stabilized small bandwidth (:82-93);
  * ``MPConv`` — weight-normalized conv/linear with magnitude-preserving
    scaling and circular ("cylindrical") padding mode (:126-153). The
    reference's in-place *forced* weight normalization during training
    (:138-139) is a parameter-side effect; in the functional design it is
    the explicit ``force_weight_norm(params)`` projection the trainer
    applies after each update — the forward always uses normalize(w), so
    the math is identical;
  * encoder/decoder ``Block`` with pixel-norm, learned emb gain, balanced
    residual/attention sums and activation clipping (:160-257);
  * the ones-channel concat at the input and learned ``out_gain`` (:309,
    :422, :433).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def normalize(x: jnp.ndarray, axis=None, eps: float = 1e-4) -> jnp.ndarray:
    """Unit-magnitude normalization (reference edm2.py:15-20)."""
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    )
    n_kept = 1
    for a in axis:
        n_kept *= x.shape[a]
    norm = eps + norm * np.sqrt(1.0 / n_kept)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


def mp_silu(x):
    return jax.nn.silu(x) / 0.596


def mp_sum(a, b, t=0.5):
    return (a + t * (b - a)) / np.sqrt((1 - t) ** 2 + t**2)


def mp_cat(a, b, axis=-1, t=0.5):
    Na, Nb = a.shape[axis], b.shape[axis]
    C = np.sqrt((Na + Nb) / ((1 - t) ** 2 + t**2))
    wa = C / np.sqrt(Na) * (1 - t)
    wb = C / np.sqrt(Nb) * t
    return jnp.concatenate([wa * a, wb * b], axis=axis)


def resample(x, f=(1, 1), mode="keep"):
    """Depthwise up/down by a separable filter, NHWC (reference :36-53)."""
    if mode == "keep":
        return x
    f = np.asarray(f, np.float32)
    assert f.ndim == 1 and len(f) % 2 == 0
    pad = (len(f) - 1) // 2
    f = f / f.sum()
    k = np.outer(f, f)
    C = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    if mode == "down":
        fw = jnp.asarray(k, x.dtype).reshape(*k.shape, 1, 1)
        fw = jnp.tile(fw, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, fw, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=C,
        )
    assert mode == "up"
    fk = len(f)
    fw = jnp.asarray(4 * k, x.dtype).reshape(fk, fk, 1, 1)
    fw = jnp.tile(fw, (1, 1, 1, C))
    # conv_transpose(stride 2, padding=pad) == lhs-dilated conv with
    # padding (fk-1-pad) on each side (filter symmetric -> no flip).
    return jax.lax.conv_general_dilated(
        x, fw, window_strides=(1, 1),
        padding=[(fk - 1 - pad, fk - 1 - pad)] * 2,
        lhs_dilation=(2, 2), dimension_numbers=dn, feature_group_count=C,
    )


class MPFourier(nn.Module):
    num_channels: int
    bandwidth: float = 0.02

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs",
            lambda key, shape: 2 * np.pi * self.bandwidth * jax.random.normal(key, shape),
            (self.num_channels,),
        )
        phases = self.param(
            "phases",
            lambda key, shape: 2 * np.pi * jax.random.uniform(key, shape),
            (self.num_channels,),
        )
        y = x.astype(jnp.float32)[:, None] * freqs[None] + phases[None]
        return (jnp.cos(y) * np.sqrt(2)).astype(x.dtype)


class MPConv(nn.Module):
    """Weight-normalized conv / linear (reference :126-153). kernel=() makes
    it a linear layer; 4D kernels use cylindrical padding when
    pmode='circular'."""

    in_channels: int
    out_channels: int
    kernel: Sequence[int] = ()
    pmode: str = "zeros"

    @nn.compact
    def __call__(self, x, gain=1.0):
        shape = (
            (self.out_channels, self.in_channels, *self.kernel)
            if self.kernel
            else (self.out_channels, self.in_channels)
        )
        w = self.param("mp_weight", nn.initializers.normal(1.0), shape)
        w = normalize(w)  # traditional weight normalization
        fan_in = int(np.prod(w.shape[1:]))
        w = w * (gain / np.sqrt(fan_in))
        w = w.astype(x.dtype)
        if w.ndim == 2:
            return x @ w.T
        kh, kw = w.shape[-2], w.shape[-1]
        pad = kw // 2
        if self.pmode == "circular" and pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="wrap")
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
            padding = "VALID"
        else:
            padding = [(kh // 2, kh // 2), (pad, pad)]
        # OIHW -> HWIO
        wk = jnp.transpose(w, (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, wk, window_strides=(1, 1), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def force_weight_norm(params):
    """Project all MPConv weights back to unit magnitude — the functional
    counterpart of the reference's in-place forced normalization during
    training (edm2.py:138-139). Apply to params after each optimizer step."""

    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if names and names[-1] == "mp_weight":
            return normalize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


class EDM2Block(nn.Module):
    """Encoder/decoder block (reference edm2.py:160-257)."""

    in_channels: int
    out_channels: int
    emb_channels: int
    flavor: str = "enc"
    resample_mode: str = "keep"
    resample_filter: Sequence[float] = (1, 1)
    attention: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: Optional[float] = 256.0
    pmode: str = "zeros"

    @nn.compact
    def __call__(self, x, emb):
        heads = self.out_channels // self.channels_per_head if self.attention else 0
        x = resample(x, f=self.resample_filter, mode=self.resample_mode)
        skip = None
        if self.in_channels != self.out_channels:
            skip = MPConv(self.in_channels, self.out_channels, (1, 1),
                          name="conv_skip")
        if self.flavor == "enc":
            if skip is not None:
                x = skip(x)
                skip = None
            x = normalize(x, axis=-1)  # pixel-norm

        y = MPConv(
            self.out_channels if self.flavor == "enc" else self.in_channels,
            self.out_channels, (3, 3), pmode=self.pmode, name="conv_res0",
        )(mp_silu(x))
        emb_gain = self.param("emb_gain", nn.initializers.zeros_init(), ())
        c = MPConv(self.emb_channels, self.out_channels * 2, name="emb_linear")(
            emb, gain=emb_gain
        )
        s, b = jnp.split(c, 2, axis=-1)
        s = normalize(s, axis=-1)[:, None, None, :]
        b = normalize(b, axis=-1)[:, None, None, :]
        y = mp_silu(y * s + b)
        y = MPConv(self.out_channels, self.out_channels, (3, 3),
                   pmode=self.pmode, name="conv_res1")(y)

        if self.flavor == "dec" and skip is not None:
            x = skip(x)
        x = mp_sum(x, y, t=self.res_balance)

        if heads:
            B, H, W, C = x.shape
            y = MPConv(self.out_channels, self.out_channels * 3, (1, 1),
                       name="attn_qkv")(x)
            ch = C // heads
            # reference channel layout (edm2.py:244-246): qkv reshaped to
            # (B, heads, ch, 3, HW) — the 3-axis is INNERMOST within each
            # head's channel block; pixel-norm over ch before the split.
            y = y.reshape(B, H * W, heads, ch, 3)
            y = normalize(y, axis=-2)
            q, k, v = y[..., 0], y[..., 1], y[..., 2]
            w = jax.nn.softmax(
                jnp.einsum(
                    "bnhc,bmhc->bhnm",
                    q.astype(jnp.float32),
                    k.astype(jnp.float32) / math.sqrt(ch),
                ),
                axis=-1,
            )
            y = jnp.einsum("bhnm,bmhc->bnhc", w, v.astype(jnp.float32))
            y = y.reshape(B, H, W, C).astype(x.dtype)
            y = MPConv(self.out_channels, self.out_channels, (1, 1),
                       name="attn_proj")(y)
            x = mp_sum(x, y, t=self.attn_balance)

        if self.clip_act is not None:
            x = jnp.clip(x, -self.clip_act, self.clip_act)
        return x


class EDM2UNet(nn.Module):
    """EDM2 U-Net (reference edm2.py:264-434). NHWC, same call contract as
    the other backbones."""

    img_resolution: Sequence[int]
    in_channels: int
    out_channels: int
    auxiliary_dim: int = 0
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    attn_resolutions: Sequence = ((0, 0),)
    label_balance: float = 0.5
    concat_balance: float = 0.5
    pmode: str = "circular"
    dropout: float = 0.0
    logvar: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, auxiliary=None, jvp: bool = False,
                 return_logvar: bool = False):
        H, W = tuple(self.img_resolution)
        B = x.shape[0]
        cblock = [self.model_channels * m for m in self.channel_mult]
        cnoise = (
            self.model_channels * self.channel_mult_noise
            if self.channel_mult_noise is not None
            else cblock[0]
        )
        cemb = (
            self.model_channels * self.channel_mult_emb
            if self.channel_mult_emb is not None
            else max(cblock)
        )
        attn_res = [list(r) for r in self.attn_resolutions]
        block_kwargs = dict(pmode=self.pmode, dropout=self.dropout)

        t = jnp.asarray(t, jnp.float32).reshape(-1)
        if t.shape[0] == 1 and B > 1:
            t = jnp.broadcast_to(t, (B,))
        emb = MPConv(cnoise, cemb, name="emb_noise")(
            MPFourier(cnoise, name="emb_fourier")(t)
        )
        if self.auxiliary_dim and auxiliary is not None:
            aux = jnp.asarray(auxiliary, jnp.float32).reshape(B, self.auxiliary_dim)
            emb = mp_sum(
                emb,
                MPConv(self.auxiliary_dim, cemb, name="emb_label")(
                    aux * np.sqrt(self.auxiliary_dim)
                ),
                t=self.label_balance,
            )
        emb = mp_silu(emb)

        # ones-channel concat (reference :422).
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)

        skips = []
        skip_ch = []
        cout = self.in_channels + 1
        for level, channels in enumerate(cblock):
            res = [H >> level, W >> level]
            rname = f"{res[0]}x{res[1]}"
            if level == 0:
                cin, cout = cout, channels
                x = MPConv(cin, cout, (3, 3), pmode=self.pmode,
                           name=f"enc_{rname}_conv")(x)
            else:
                x = EDM2Block(cout, cout, cemb, flavor="enc",
                              resample_mode="down", name=f"enc_{rname}_down",
                              **block_kwargs)(x, emb)
            skips.append(x)
            skip_ch.append(cout)
            for idx in range(self.num_blocks):
                cin, cout = cout, channels
                x = EDM2Block(
                    cin, cout, cemb, flavor="enc", attention=res in attn_res,
                    name=f"enc_{rname}_block{idx}", **block_kwargs,
                )(x, emb)
                skips.append(x)
                skip_ch.append(cout)

        for level, channels in reversed(list(enumerate(cblock))):
            res = [H >> level, W >> level]
            rname = f"{res[0]}x{res[1]}"
            if level == len(cblock) - 1:
                x = EDM2Block(cout, cout, cemb, flavor="dec", attention=True,
                              name=f"dec_{rname}_in0", **block_kwargs)(x, emb)
                x = EDM2Block(cout, cout, cemb, flavor="dec",
                              name=f"dec_{rname}_in1", **block_kwargs)(x, emb)
            else:
                x = EDM2Block(cout, cout, cemb, flavor="dec",
                              resample_mode="up", name=f"dec_{rname}_up",
                              **block_kwargs)(x, emb)
            for idx in range(self.num_blocks + 1):
                cin = cout + skip_ch.pop()
                x = mp_cat(x, skips.pop(), t=self.concat_balance)
                cout = channels
                x = EDM2Block(
                    cin, cout, cemb, flavor="dec", attention=res in attn_res,
                    name=f"dec_{rname}_block{idx}", **block_kwargs,
                )(x, emb)

        out_gain = self.param("out_gain", nn.initializers.zeros_init(), ())
        x = MPConv(cout, self.out_channels, (3, 3), pmode=self.pmode,
                   name="out_conv")(x, gain=out_gain)
        return x.astype(jnp.float32)
