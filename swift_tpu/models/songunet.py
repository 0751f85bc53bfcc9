"""SongUNet (DDPM++ / NCSN++) — EDM's U-Net, TPU-native NHWC.

Behavioral parity with the reference (reference:
src/swift/models/songunet.py:457-757):

  * ``cylindrical_pad`` — zero (Neumann) padding on latitude, circular on
    longitude (:142-149);
  * Conv2d with optional up/down resampling through a separable resample
    filter (:96-203): down = depthwise strided conv, up = depthwise
    transposed conv (×4 filter) expressed as an lhs-dilated XLA conv;
  * GroupNorm with ``min(32, C//4)`` groups (:210-226);
  * ``UNetBlock`` — residual block with emb affine (additive when
    ``adaptive_scale=False`` as the DDPM++ config uses), optional fp32
    single-head self-attention (:235-265, :398-409) and SE channel
    attention (:33-55);
  * encoder/decoder ModuleDicts with skip/aux paths for
    standard/skip/residual encoder types (:567-757);
  * positional (endpoint) / fourier timestep embeddings with the EDM
    sin/cos flip applied in forward (:417-447, :707-710).

All convs are XLA ``conv_general_dilated`` (MXU); attention only appears at
the (tiny) bottleneck so no custom kernel is warranted (SURVEY.md §2.2).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _weight_init(mode: str, fan_in: int, fan_out: int, gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        if mode == "xavier_uniform":
            lim = math.sqrt(6 / (fan_in + fan_out))
            return gain * jax.random.uniform(key, shape, dtype, -lim, lim)
        if mode == "xavier_normal":
            return gain * math.sqrt(2 / (fan_in + fan_out)) * jax.random.normal(key, shape, dtype)
        if mode == "kaiming_uniform":
            lim = math.sqrt(3 / fan_in)
            return gain * jax.random.uniform(key, shape, dtype, -lim, lim)
        if mode == "kaiming_normal":
            return gain * math.sqrt(1 / fan_in) * jax.random.normal(key, shape, dtype)
        raise ValueError(f'Invalid init mode "{mode}"')

    return init


def cylindrical_pad(x: jnp.ndarray, pad: int, mode: str = "circular") -> jnp.ndarray:
    """NHWC: zero-pad latitude (H), wrap/reflect/zero longitude (W)."""
    if pad == 0:
        return x
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    wmode = {"circular": "wrap", "reflect": "reflect", "replicate": "edge",
             "constant": "constant", "zeros": "constant"}[mode]
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode=wmode)


def _resample_kernel(f: Sequence[float]) -> np.ndarray:
    f = np.asarray(f, np.float32)
    k = np.outer(f, f) / (f.sum() ** 2)
    return k


class Conv2dResample(nn.Module):
    """Conv with optional depthwise up/down resampling (reference :96-203)."""

    in_channels: int
    out_channels: int
    kernel: int
    bias: bool = True
    up: bool = False
    down: bool = False
    padding_mode: str = "zeros"
    resample_filter: Sequence[float] = (1, 1)
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = "constant" if self.padding_mode == "zeros" else self.padding_mode
        C = self.in_channels
        f = _resample_kernel(self.resample_filter)
        fk = f.shape[0]
        f_pad = (fk - 1) // 2
        w_pad = self.kernel // 2

        dn = ("NHWC", "HWIO", "NHWC")
        if self.up:
            # depthwise transposed conv with 4*f, stride 2 == lhs-dilated conv
            # (f is symmetric so kernel flip is a no-op).
            x = cylindrical_pad(x, f_pad, mode)
            fw = jnp.asarray(4 * f, x.dtype).reshape(fk, fk, 1, 1)
            fw = jnp.tile(fw, (1, 1, 1, C))
            x = jax.lax.conv_general_dilated(
                x, fw, window_strides=(1, 1),
                padding=[(fk - 1, fk - 1), (fk - 1, fk - 1)],
                lhs_dilation=(2, 2), dimension_numbers=dn,
                feature_group_count=C,
            )
        if self.down:
            x = cylindrical_pad(x, f_pad, mode)
            fw = jnp.asarray(f, x.dtype).reshape(fk, fk, 1, 1)
            fw = jnp.tile(fw, (1, 1, 1, C))
            x = jax.lax.conv_general_dilated(
                x, fw, window_strides=(2, 2), padding="VALID",
                dimension_numbers=dn, feature_group_count=C,
            )
        if self.kernel:
            fan = dict(
                fan_in=C * self.kernel**2, fan_out=self.out_channels * self.kernel**2
            )
            w = self.param(
                "kernel",
                _weight_init(self.init_mode, gain=self.init_weight, **fan),
                (self.kernel, self.kernel, C, self.out_channels),
            )
            x = cylindrical_pad(x, w_pad, mode)
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(1, 1), padding="VALID",
                dimension_numbers=dn,
            )
            if self.bias:
                b = self.param(
                    "bias",
                    _weight_init(self.init_mode, gain=self.init_bias, **fan),
                    (self.out_channels,),
                )
                x = x + b.astype(x.dtype)
        return x


class EDMLinear(nn.Module):
    in_features: int
    out_features: int
    bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        fan = dict(fan_in=self.in_features, fan_out=self.out_features)
        w = self.param(
            "kernel",
            _weight_init(self.init_mode, gain=self.init_weight, **fan),
            (self.in_features, self.out_features),
        )
        x = x @ w.astype(x.dtype)
        if self.bias:
            b = self.param(
                "bias", _weight_init(self.init_mode, gain=self.init_bias, **fan),
                (self.out_features,),
            )
            x = x + b.astype(x.dtype)
        return x


class EDMGroupNorm(nn.Module):
    num_channels: int
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        groups = min(self.num_groups, self.num_channels // self.min_channels_per_group)
        return nn.GroupNorm(
            num_groups=groups, epsilon=self.eps, dtype=jnp.float32, name="gn"
        )(x)


class ChannelAttention(nn.Module):
    """SE gate (reference :33-55)."""

    channels: int
    reduction: int = 16
    init_mode: str = "xavier_uniform"

    @nn.compact
    def __call__(self, x):
        pooled = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        h = Conv2dResample(
            self.channels, self.channels // self.reduction, kernel=1, bias=False,
            init_mode=self.init_mode, name="conv0",
        )(pooled)
        h = Conv2dResample(
            self.channels // self.reduction, self.channels, kernel=1, bias=False,
            init_mode=self.init_mode, name="conv1",
        )(jax.nn.silu(h))
        return x * jax.nn.sigmoid(h)


class UNetBlock(nn.Module):
    """Residual block, union of DDPM++/NCSN++/ADM features (reference :274-410)."""

    in_channels: int
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    channel_attention: bool = False
    se_reduction: int = 16
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    padding_mode: str = "zeros"
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Sequence[float] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init_mode: str = "kaiming_normal"
    zero_init_weight: float = 0.0
    attn_init_weight: Optional[float] = None

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        heads = (
            0
            if not self.attention
            else (
                self.num_heads
                if self.num_heads is not None
                else self.out_channels // self.channels_per_head
            )
        )
        conv_common = dict(
            padding_mode=self.padding_mode,
            resample_filter=self.resample_filter,
            init_mode=self.init_mode,
        )
        orig = x
        x = EDMGroupNorm(self.in_channels, eps=self.eps, name="norm0")(x)
        x = Conv2dResample(
            self.in_channels, self.out_channels, kernel=3,
            up=self.up, down=self.down, name="conv0", **conv_common,
        )(jax.nn.silu(x))

        params = EDMLinear(
            self.emb_channels,
            self.out_channels * (2 if self.adaptive_scale else 1),
            init_mode=self.init_mode, name="affine",
        )(emb)[:, None, None, :]
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            x = jax.nn.silu(
                shift + EDMGroupNorm(self.out_channels, eps=self.eps, name="norm1")(x)
                * (scale + 1)
            )
        else:
            x = jax.nn.silu(
                EDMGroupNorm(self.out_channels, eps=self.eps, name="norm1")(x + params)
            )

        if self.dropout and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = Conv2dResample(
            self.out_channels, self.out_channels, kernel=3,
            padding_mode=self.padding_mode, init_mode=self.init_mode,
            init_weight=self.zero_init_weight, name="conv1",
        )(x)

        if self.out_channels != self.in_channels or self.up or self.down:
            kernel = 1 if self.resample_proj or self.out_channels != self.in_channels else 0
            skip = Conv2dResample(
                self.in_channels, self.out_channels, kernel=kernel,
                up=self.up, down=self.down, name="skip", **conv_common,
            )(orig)
        else:
            skip = orig
        x = (x + skip) * self.skip_scale

        if self.channel_attention:
            x = ChannelAttention(
                self.out_channels, self.se_reduction, self.init_mode, name="ca"
            )(x)

        if heads:
            B, H, W, C = x.shape
            h = EDMGroupNorm(self.out_channels, eps=self.eps, name="norm2")(x)
            qkv = Conv2dResample(
                self.out_channels, self.out_channels * 3, kernel=1,
                padding_mode=self.padding_mode, init_mode=self.init_mode,
                init_weight=(
                    self.attn_init_weight if self.attn_init_weight is not None else 1.0
                ),
                name="qkv",
            )(h)
            ch = C // heads
            # reference channel layout (songunet.py:398-404): qkv output
            # reshaped (B·heads, ch, 3, HW) — q/k/v INTERLEAVE every third
            # channel within each head's block, with the 3-axis innermost.
            qkv = qkv.reshape(B, H * W, heads, ch, 3).astype(jnp.float32)
            q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            w = jax.nn.softmax(
                jnp.einsum("bnhc,bmhc->bhnm", q, k / math.sqrt(ch)), axis=-1
            )
            a = jnp.einsum("bhnm,bmhc->bnhc", w, v).reshape(B, H, W, C).astype(x.dtype)
            a = Conv2dResample(
                self.out_channels, self.out_channels, kernel=1,
                padding_mode=self.padding_mode, init_mode=self.init_mode,
                init_weight=self.zero_init_weight, name="proj",
            )(a)
            x = (x + a) * self.skip_scale
        return x


def positional_embedding(t, num_channels, max_positions=10_000, endpoint=False):
    freqs = jnp.arange(num_channels // 2, dtype=jnp.float32)
    freqs = freqs / (num_channels // 2 - (1 if endpoint else 0))
    freqs = (1 / max_positions) ** freqs
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class SongUNet(nn.Module):
    """DDPM++/NCSN++ U-Net, NHWC (reference songunet.py:457-757)."""

    img_resolution: Sequence[int]
    in_channels: int
    out_channels: int
    auxiliary_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Sequence = ((0, 0),)
    dropout: float = 0.10
    auxiliary_dropout: float = 0.0
    eps: float = 1e-6
    skip_scale: float = float(np.sqrt(0.5))
    init_mode: str = "xavier_uniform"
    zero_init_weight: float = 1e-5
    attn_init_weight: float = float(np.sqrt(0.2))
    padding_mode: str = "circular"
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: Sequence[float] = (1, 1)
    logvar: bool = False  # unsupported head kept for API uniformity
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, auxiliary=None, jvp: bool = False,
                 return_logvar: bool = False, augment_labels=None):
        assert self.embedding_type in ("fourier", "positional")
        assert self.encoder_type in ("standard", "skip", "residual")
        assert self.decoder_type in ("standard", "skip")
        H, W = tuple(self.img_resolution)
        B = x.shape[0]
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        attn_res = [list(r) for r in self.attn_resolutions]

        block_kwargs = dict(
            emb_channels=emb_channels,
            num_heads=1,
            padding_mode=self.padding_mode,
            dropout=self.dropout,
            skip_scale=self.skip_scale,
            eps=self.eps,
            resample_filter=tuple(self.resample_filter),
            resample_proj=True,
            adaptive_scale=False,
            init_mode=self.init_mode,
            zero_init_weight=self.zero_init_weight,
            attn_init_weight=self.attn_init_weight,
        )

        # ---- mapping
        t = jnp.asarray(t, jnp.float32).reshape(-1)
        if t.shape[0] == 1 and B > 1:
            t = jnp.broadcast_to(t, (B,))
        if self.embedding_type == "positional":
            emb = positional_embedding(t, noise_channels, endpoint=True)
        else:
            freqs = self.param(
                "fourier_freqs",
                lambda key, shape: 16.0 * jax.random.normal(key, shape),
                (noise_channels // 2,),
            )
            args = t[:, None] * (2 * np.pi * freqs)[None]
            emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
        # EDM sin/cos flip (reference :707-710).
        emb = jnp.flip(emb.reshape(B, 2, -1), axis=1).reshape(B, -1)
        if self.auxiliary_dim and auxiliary is not None:
            aux = jnp.asarray(auxiliary, jnp.float32).reshape(B, self.auxiliary_dim)
            emb = emb + EDMLinear(
                self.auxiliary_dim, noise_channels, init_mode=self.init_mode,
                name="map_auxiliary",
            )(aux * math.sqrt(self.auxiliary_dim))
        if self.augment_dim and augment_labels is not None:
            emb = emb + EDMLinear(
                self.augment_dim, noise_channels, bias=False,
                init_mode=self.init_mode, name="map_augment",
            )(augment_labels)
        emb = jax.nn.silu(EDMLinear(
            noise_channels, emb_channels, init_mode=self.init_mode, name="map_layer0"
        )(emb))
        emb = jax.nn.silu(EDMLinear(
            emb_channels, emb_channels, init_mode=self.init_mode, name="map_layer1"
        )(emb))

        # ---- encoder
        skips = []
        skip_channels = []
        aux = x
        caux = self.in_channels
        cout = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = (H >> level, W >> level)
            rname = f"{res[0]}x{res[1]}"
            if level == 0:
                cin, cout = cout, self.model_channels
                x = Conv2dResample(
                    cin, cout, kernel=3, padding_mode=self.padding_mode,
                    init_mode=self.init_mode, name=f"enc_{rname}_conv",
                )(x)
                skips.append(x)
                skip_channels.append(cout)
            else:
                x = UNetBlock(
                    cout, cout, down=True, channel_attention=True,
                    name=f"enc_{rname}_down", **block_kwargs,
                )(x, emb)
                skips.append(x)
                skip_channels.append(cout)
                if self.encoder_type == "skip":
                    aux = Conv2dResample(
                        caux, caux, kernel=0, down=True,
                        padding_mode=self.padding_mode,
                        resample_filter=tuple(self.resample_filter),
                        name=f"enc_{rname}_aux_down",
                    )(aux)
                    x = x + Conv2dResample(
                        caux, cout, kernel=1, padding_mode=self.padding_mode,
                        init_mode=self.init_mode, name=f"enc_{rname}_aux_skip",
                    )(aux)
                    skips[-1] = x
                if self.encoder_type == "residual":
                    a = Conv2dResample(
                        caux, cout, kernel=3, down=True,
                        padding_mode=self.padding_mode,
                        resample_filter=tuple(self.resample_filter),
                        init_mode=self.init_mode, name=f"enc_{rname}_aux_residual",
                    )(aux)
                    x = (x + a) / math.sqrt(2)
                    skips[-1] = x
                    aux = x
                    caux = cout
            for idx in range(self.num_blocks):
                cin, cout = cout, self.model_channels * mult
                attn = list(res) in attn_res
                x = UNetBlock(
                    cin, cout, attention=attn, channel_attention=True,
                    name=f"enc_{rname}_block{idx}", **block_kwargs,
                )(x, emb)
                skips.append(x)
                skip_channels.append(cout)

        # ---- decoder
        aux_out = None
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = (H >> level, W >> level)
            rname = f"{res[0]}x{res[1]}"
            if level == len(self.channel_mult) - 1:
                x = UNetBlock(
                    cout, cout, attention=True, channel_attention=True,
                    name=f"dec_{rname}_in0", **block_kwargs,
                )(x, emb)
                x = UNetBlock(
                    cout, cout, attention=False, channel_attention=True,
                    name=f"dec_{rname}_in1", **block_kwargs,
                )(x, emb)
            else:
                x = UNetBlock(
                    cout, cout, up=True, channel_attention=True,
                    name=f"dec_{rname}_up", **block_kwargs,
                )(x, emb)
            for idx in range(self.num_blocks + 1):
                cin = cout + skip_channels.pop()
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                cout = self.model_channels * mult
                attn = idx == self.num_blocks and list(res) in attn_res
                x = UNetBlock(
                    cin, cout, attention=attn, channel_attention=True,
                    name=f"dec_{rname}_block{idx}", **block_kwargs,
                )(x, emb)
            if self.decoder_type == "skip" or level == 0:
                if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                    aux_out = Conv2dResample(
                        self.out_channels, self.out_channels, kernel=0, up=True,
                        padding_mode=self.padding_mode,
                        resample_filter=tuple(self.resample_filter),
                        name=f"dec_{rname}_aux_up",
                    )(aux_out)
                tmp = EDMGroupNorm(cout, eps=1e-6, name=f"dec_{rname}_aux_norm")(x)
                tmp = Conv2dResample(
                    cout, self.out_channels, kernel=3,
                    padding_mode=self.padding_mode, init_mode=self.init_mode,
                    init_weight=self.zero_init_weight,
                    name=f"dec_{rname}_aux_conv",
                )(jax.nn.silu(tmp))
                aux_out = tmp if aux_out is None else tmp + aux_out

        return aux_out.astype(jnp.float32)
