"""Checkpoint-interchange golden tests.

``TorchSwinRef`` is an independent torch transcription of the reference
SwinV2 forward semantics (reference: src/swift/models/swinv2.py:254-330) used
as the golden model: we convert its state_dict to our flax params and demand
numerically matching outputs (NCHW<->NHWC at the boundary).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

from swift_tpu.models.convert import (
    swinv2_params_to_state_dict,
    swinv2_state_dict_to_params,
)
from swift_tpu.models.swinv2 import SwinV2

torch.manual_seed(0)

H, W, CIN, COUT = 8, 16, 6, 3
PATCH = (2, 2)
WIN = (2, 2)
SHIFT = (1, 1)
DEPTH = 2
DIM = 32
HEADS = 4


class TorchModNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim, 1e-6)
        self.modulation = nn.Linear(dim, 2 * dim)

    def forward(self, x, t):
        x = self.norm(x)
        scale, shift = self.modulation(t).chunk(2, dim=-1)
        return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class TorchAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        hd = dim // heads
        self.heads = heads
        self.norm = TorchModNorm(dim)
        self.to_qkv = nn.Linear(dim, 3 * hd * heads, bias=False)
        self.wo = nn.Linear(hd * heads, dim, bias=False)
        self.scale = nn.Parameter(torch.log(10 * torch.ones(1, heads, 1, 1)))

    def forward(self, x, t):
        b, n, _ = x.shape
        qkv = self.to_qkv(x).view(b, n, self.heads, -1).permute(0, 2, 1, 3)
        q, k, v = qkv.chunk(3, dim=-1)
        q = TF.normalize(q, dim=-1) * torch.clamp(
            self.scale, max=math.log(100.0)
        ).exp()
        k = TF.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.norm(self.wo(out), t)


class TorchFF(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = TorchModNorm(dim)
        self.w1 = nn.Linear(dim, 2 * hidden, bias=False)
        self.w2 = nn.Linear(hidden, dim, bias=False)

    def forward(self, x, t):
        gate, up = self.w1(x).chunk(2, dim=-1)
        return self.norm(self.w2(TF.silu(gate) * up), t)


def torch_timestep_embedding(t, dim, max_period=10_000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=t.dtype) / half
    )
    args = t[:, None] * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    return emb.reshape(emb.shape[0], 2, -1).flip(1).reshape(*emb.shape)


class TorchSwinRef(nn.Module):
    """Golden model: reference SwinV2 semantics in NCHW torch."""

    def __init__(self):
        super().__init__()
        gh, gw = H // PATCH[0], W // PATCH[1]
        self.gh, self.gw = gh, gw
        self.pos_embed = nn.Parameter(torch.randn(1, gh * gw, DIM) * 0.02)

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = nn.Linear(CIN * PATCH[0] * PATCH[1], DIM)

            def forward(self, x):  # x: (B, C, H, W)
                b, c, h, w = x.shape
                p1, p2 = PATCH
                x = x.view(b, c, h // p1, p1, w // p2, p2)
                # -> b (h w) (p1 p2 c)
                x = x.permute(0, 2, 4, 3, 5, 1).reshape(
                    b, (h // p1) * (w // p2), p1 * p2 * c
                )
                return self.emb(x)

        self.patch_embed = PatchEmbed()

        class Latent(nn.Module):
            def __init__(self):
                super().__init__()
                self.l1 = nn.Linear(DIM, DIM)
                self.l2 = nn.Linear(DIM, DIM)

            def forward(self, e):
                return TF.silu(self.l2(TF.silu(self.l1(e))))

        self.latent_embed = Latent()
        self.auxiliary_embed = nn.Linear(1, DIM)
        self.logvar_embed = nn.Linear(DIM, 1)

        class Transformer(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [
                        nn.ModuleList(
                            [TorchAttn(DIM, HEADS), TorchFF(DIM, int(8 / 3 * DIM))]
                        )
                        for _ in range(DEPTH)
                    ]
                )

        self.transformer = Transformer()

        class Head(nn.Module):
            def __init__(self, gh, gw):
                super().__init__()
                self.head = nn.ModuleList([nn.Linear(DIM, COUT * PATCH[0] * PATCH[1], bias=False)])
                self.gh, self.gw = gh, gw

            def forward(self, x):
                b = x.shape[0]
                p1, p2 = PATCH
                x = self.head[0](x)  # b, n, (c p1 p2)
                x = x.view(b, self.gh, self.gw, COUT, p1, p2)
                x = x.permute(0, 3, 1, 4, 2, 5).reshape(
                    b, COUT, self.gh * p1, self.gw * p2
                )
                return x

        self.head = Head(gh, gw)

    def state_dict_reference_layout(self):
        """Rename keys to the reference layout used by the converter."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("head.head.0.", "head.head.0.")
            for i in range(DEPTH):
                k = k.replace(f"transformer.layers.{i}.0.", f"transformer.layers.{i}.0.")
            sd["model." + k] = v
        return sd

    def forward(self, x, t, auxiliary):
        gh, gw = self.gh, self.gw
        h = self.patch_embed(x) + self.pos_embed
        emb = torch_timestep_embedding(t, DIM)
        emb = emb + self.auxiliary_embed(auxiliary * math.sqrt(1.0))
        cond = self.latent_embed(emb)

        def window_partition(z, ws):
            b, hh, ww_, c = z.shape
            z = z.view(b, hh // ws[0], ws[0], ww_ // ws[1], ws[1], c)
            return (
                z.permute(0, 1, 3, 2, 4, 5)
                .reshape(-1, ws[0] * ws[1], c)
            )

        def window_reverse(z, ws, hw):
            hh, ww_ = hw
            c = z.shape[-1]
            z = z.view(-1, hh // ws[0], ww_ // ws[1], ws[0], ws[1], c)
            return z.permute(0, 1, 3, 2, 4, 5).reshape(-1, hh, ww_, c)

        nw = (gh // WIN[0]) * (gw // WIN[1])
        t_exp = cond.repeat_interleave(nw, dim=0)
        z = h
        for i, (attn, ff) in enumerate(self.transformer.layers):
            zp = z
            z = z.view(-1, gh, gw, DIM)
            if i % 2 != 0:
                z = torch.roll(z, shifts=(-SHIFT[0], -SHIFT[1]), dims=(1, 2))
            z = window_partition(z, WIN)
            z = attn(z, t_exp)
            z = window_reverse(z, WIN, (gh, gw))
            if i % 2 != 0:
                z = torch.roll(z, shifts=(SHIFT[0], SHIFT[1]), dims=(1, 2))
            z = z.reshape(-1, gh * gw, DIM)
            z = zp + z
            z = z + ff(z, cond)
        out = self.head(z)
        logvar = self.logvar_embed(cond).squeeze(-1)
        return out, logvar


@pytest.fixture(scope="module", params=[False, True], ids=["unrolled", "scan"])
def models(request):
    scan = request.param
    tm = TorchSwinRef().eval()
    jm = SwinV2(
        img_resolution=(H, W), in_channels=CIN, out_channels=COUT,
        window_size=WIN, shift_size=SHIFT, patch_size=PATCH,
        depth=DEPTH, dim=DIM, heads=HEADS, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, scan_layers=scan,
    )
    params = swinv2_state_dict_to_params(
        tm.state_dict_reference_layout(), DEPTH, scan_layers=scan
    )
    return tm, jm, params


def test_forward_parity(models):
    tm, jm, params = models
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, CIN, H, W)).astype(np.float32)
    t = np.array([0.7, 1.3], np.float32)
    aux = np.array([[0.6], [1.2]], np.float32)

    with torch.no_grad():
        ty, tlv = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(aux))

    jy, jlv = jm.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        jnp.asarray(t),
        auxiliary=jnp.asarray(aux),
        return_logvar=True,
    )
    jy_nchw = np.asarray(jy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jy_nchw, ty.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jlv), tlv.numpy(), rtol=2e-4, atol=2e-4)


def test_load_reference_pt_checkpoint(models, tmp_path):
    """A torch-saved reference checkpoint ({'ema': state_dict}) loads into
    the scan-layers param layout and reproduces the converted forward."""
    from swift_tpu.models.convert import load_reference_checkpoint

    tm, jm, params = models
    path = str(tmp_path / "checkpoint-000001.pt")
    torch.save({"ema": tm.state_dict_reference_layout()}, path)
    loaded = load_reference_checkpoint(path, DEPTH, scan_layers="pairs" in params)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_state_dict_roundtrip(models):
    tm, jm, params = models
    sd = swinv2_params_to_state_dict(params)
    params2 = swinv2_state_dict_to_params(sd, DEPTH, scan_layers="pairs" in params)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params2)[0],
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
