"""Swin v1 (RoPE) checkpoint converter: structural + forward sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from swift_tpu.models.convert import swin_v1_state_dict_to_params
from swift_tpu.models.swin import Swin

H, W, C, D, HEADS, HD, MLP, DEPTH = 8, 16, 4, 32, 4, 8, 64, 2


def _torch_sd():
    torch.manual_seed(0)
    sd = {}
    sd["patch_embed.proj.weight"] = torch.randn(D, C, 2, 2)
    sd["patch_embed.proj.bias"] = torch.randn(D)
    for nm in ("l1", "l2"):
        sd[f"latent_embed.{nm}.weight"] = torch.randn(D, D)
        sd[f"latent_embed.{nm}.bias"] = torch.randn(D)
    sd["auxiliary_embed.weight"] = torch.randn(D, 1)
    sd["auxiliary_embed.bias"] = torch.randn(D)
    inner = HEADS * HD
    for i in range(DEPTH):
        b = f"transformer.layers.{i}"
        sd[f"{b}.0.norm.norm.weight"] = torch.randn(D)
        sd[f"{b}.0.norm.modulation.weight"] = torch.randn(2 * D, D)
        sd[f"{b}.0.to_qkv.weight"] = torch.randn(3 * inner, D)
        sd[f"{b}.0.wo.weight"] = torch.randn(D, inner)
        sd[f"{b}.1.norm.norm.weight"] = torch.randn(D)
        sd[f"{b}.1.norm.modulation.weight"] = torch.randn(2 * D, D)
        sd[f"{b}.1.w1.weight"] = torch.randn(2 * MLP, D)
        sd[f"{b}.1.w2.weight"] = torch.randn(D, MLP)
    sd["head.norm.norm.weight"] = torch.randn(D)
    sd["head.norm.modulation.weight"] = torch.randn(2 * D, D)
    sd["head.head.0.weight"] = torch.randn(3 * 2 * 2, D)
    return sd


def test_swin_v1_converter_structure_and_apply():
    m = Swin(
        img_resolution=(H, W), in_channels=C, out_channels=3,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=DEPTH, dim=D, heads=HEADS, head_dim=HD, mlp_dim=MLP,
        auxiliary_dim=1, dtype=jnp.float32,
    )
    init = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)), jnp.zeros((1,)),
        auxiliary=jnp.zeros((1, 1)),
    )["params"]
    conv = swin_v1_state_dict_to_params(_torch_sd(), DEPTH)
    assert jax.tree_util.tree_structure(init) == jax.tree_util.tree_structure(conv)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(init)[0],
        jax.tree_util.tree_flatten_with_path(conv)[0],
    ):
        assert pa == pb and la.shape == np.asarray(lb).shape
    y = m.apply(
        {"params": conv}, jnp.ones((1, H, W, C)), jnp.array([0.5]),
        auxiliary=jnp.ones((1, 1)),
    )
    assert y.shape == (1, H, W, 3) and bool(jnp.isfinite(y).all())
