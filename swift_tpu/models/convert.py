"""Reference (torch) checkpoint <-> swift_tpu param-pytree conversion.

The reference saves ``torch.save({"ema": state_dict, ...})`` checkpoints
(reference: src/swift/training/trainer.py:522-535) whose SwinV2 keys look
like ``model.transformer.layers.{i}.0.to_qkv.weight``. This module maps them
onto our flax param tree (and back) for checkpoint interchangeability
(BASELINE.md): torch Linear weights are (out, in) -> flax kernels (in, out);
feature orderings (per-head qkv interleave, (p1 p2 c) patch features,
(c p1 p2) head features, gate/up and scale/shift chunk orders) already
match by construction — see swift_tpu/models/swinv2.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _a(w) -> np.ndarray:
    return np.asarray(w, np.float32)


def swinv2_state_dict_to_params(
    state_dict: Mapping[str, Any], depth: int, scan_layers: bool = False
) -> dict:
    """Reference SwinV2 state_dict (optionally ``model.``-prefixed, as in the
    precond wrapper) -> our flax params dict.

    With ``scan_layers=True`` (the model default for even depths) the
    per-layer blocks are stacked into the ``pairs/{even,odd}`` layout that
    ``nn.scan`` expects: leaf arrays gain a leading depth//2 axis."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k[len("model."):] if k.startswith("model.") else k] = np.asarray(v)

    p: dict = {}
    p["pos_embed"] = _a(sd["pos_embed"])
    p["patch_embed"] = {
        "kernel": _t(sd["patch_embed.emb.weight"]),
        "bias": _a(sd["patch_embed.emb.bias"]),
    }
    p["latent_l1"] = {
        "kernel": _t(sd["latent_embed.l1.weight"]),
        "bias": _a(sd["latent_embed.l1.bias"]),
    }
    p["latent_l2"] = {
        "kernel": _t(sd["latent_embed.l2.weight"]),
        "bias": _a(sd["latent_embed.l2.bias"]),
    }
    if "auxiliary_embed.weight" in sd:
        p["auxiliary_embed"] = {
            "kernel": _t(sd["auxiliary_embed.weight"]),
            "bias": _a(sd["auxiliary_embed.bias"]),
        }
    if "logvar_embed.weight" in sd:
        p["logvar_embed"] = {
            "kernel": _t(sd["logvar_embed.weight"]),
            "bias": _a(sd["logvar_embed.bias"]),
        }
    p["head"] = {"kernel": _t(sd["head.head.0.weight"])}

    def norm(prefix: str) -> dict:
        return {
            "norm": {
                "scale": _a(sd[f"{prefix}.norm.weight"]),
                "bias": _a(sd[f"{prefix}.norm.bias"]),
            },
            "modulation": {
                "kernel": _t(sd[f"{prefix}.modulation.weight"]),
                "bias": _a(sd[f"{prefix}.modulation.bias"]),
            },
        }

    def block(i: int) -> dict:
        base = f"transformer.layers.{i}"
        return {
            "attn": {
                "to_qkv": {"kernel": _t(sd[f"{base}.0.to_qkv.weight"])},
                "wo": {"kernel": _t(sd[f"{base}.0.wo.weight"])},
                "norm": norm(f"{base}.0.norm"),
                "scale": _a(sd[f"{base}.0.scale"]).reshape(-1),
            },
            "ff": {
                "w1": {"kernel": _t(sd[f"{base}.1.w1.weight"])},
                "w2": {"kernel": _t(sd[f"{base}.1.w2.weight"])},
                "norm": norm(f"{base}.1.norm"),
            },
        }

    if scan_layers and depth % 2 == 0:
        import jax

        evens = [block(i) for i in range(0, depth, 2)]
        odds = [block(i) for i in range(1, depth, 2)]
        stack = lambda blocks: jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves, axis=0), *blocks
        )
        p["pairs"] = {"even": stack(evens), "odd": stack(odds)}
    else:
        for i in range(depth):
            p[f"block{i}"] = block(i)
    return p


def swinv2_params_to_state_dict(params: Mapping[str, Any]) -> dict:
    """Inverse mapping: our flax params -> reference-layout state_dict
    (``model.``-prefixed, numpy arrays)."""
    out: dict[str, np.ndarray] = {}

    def put(key, val, transpose=False):
        v = np.asarray(val, np.float32)
        out[f"model.{key}"] = np.ascontiguousarray(v.T if transpose else v)

    put("pos_embed", params["pos_embed"])
    put("patch_embed.emb.weight", params["patch_embed"]["kernel"], True)
    put("patch_embed.emb.bias", params["patch_embed"]["bias"])
    put("latent_embed.l1.weight", params["latent_l1"]["kernel"], True)
    put("latent_embed.l1.bias", params["latent_l1"]["bias"])
    put("latent_embed.l2.weight", params["latent_l2"]["kernel"], True)
    put("latent_embed.l2.bias", params["latent_l2"]["bias"])
    if "auxiliary_embed" in params:
        put("auxiliary_embed.weight", params["auxiliary_embed"]["kernel"], True)
        put("auxiliary_embed.bias", params["auxiliary_embed"]["bias"])
    if "logvar_embed" in params:
        put("logvar_embed.weight", params["logvar_embed"]["kernel"], True)
        put("logvar_embed.bias", params["logvar_embed"]["bias"])
    put("head.head.0.weight", params["head"]["kernel"], True)

    def put_block(blk: dict, i: int):
        base = f"transformer.layers.{i}"
        put(f"{base}.0.to_qkv.weight", blk["attn"]["to_qkv"]["kernel"], True)
        put(f"{base}.0.wo.weight", blk["attn"]["wo"]["kernel"], True)
        put(f"{base}.0.scale",
            np.asarray(blk["attn"]["scale"], np.float32).reshape(1, -1, 1, 1))
        for mod, tkey in (("attn", "0"), ("ff", "1")):
            n = blk[mod]["norm"]
            put(f"{base}.{tkey}.norm.norm.weight", n["norm"]["scale"])
            put(f"{base}.{tkey}.norm.norm.bias", n["norm"]["bias"])
            put(f"{base}.{tkey}.norm.modulation.weight",
                n["modulation"]["kernel"], True)
            put(f"{base}.{tkey}.norm.modulation.bias", n["modulation"]["bias"])
        put(f"{base}.1.w1.weight", blk["ff"]["w1"]["kernel"], True)
        put(f"{base}.1.w2.weight", blk["ff"]["w2"]["kernel"], True)

    if "pairs" in params:
        import jax

        n_pairs = np.asarray(
            jax.tree_util.tree_leaves(params["pairs"]["even"])[0]
        ).shape[0]
        for j in range(n_pairs):
            take = lambda tree: jax.tree_util.tree_map(
                lambda a: np.asarray(a)[j], tree
            )
            put_block(take(params["pairs"]["even"]), 2 * j)
            put_block(take(params["pairs"]["odd"]), 2 * j + 1)
    else:
        i = 0
        while f"block{i}" in params:
            put_block(params[f"block{i}"], i)
            i += 1
    return out


def swin_v1_state_dict_to_params(state_dict: Mapping[str, Any], depth: int) -> dict:
    """Reference Swin v1 (RoPE variant) state_dict -> our flax params
    (swift_tpu.models.swin.Swin). Layout notes: conv patch embed kernels go
    OIHW -> HWIO; RMSNorm weight -> norm/weight; bias-free modulation."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k[len("model."):] if k.startswith("model.") else k] = np.asarray(v)

    p: dict = {}
    # conv patch embedding: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    w = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    p["patch_embed"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": _a(sd["patch_embed.proj.bias"]),
    }
    p["latent_l1"] = {
        "kernel": _t(sd["latent_embed.l1.weight"]),
        "bias": _a(sd["latent_embed.l1.bias"]),
    }
    p["latent_l2"] = {
        "kernel": _t(sd["latent_embed.l2.weight"]),
        "bias": _a(sd["latent_embed.l2.bias"]),
    }
    if "auxiliary_embed.weight" in sd:
        p["auxiliary_embed"] = {
            "kernel": _t(sd["auxiliary_embed.weight"]),
            "bias": _a(sd["auxiliary_embed.bias"]),
        }

    def mod_norm(prefix: str) -> dict:
        return {
            "norm": {"weight": _a(sd[f"{prefix}.norm.weight"])},
            "modulation": {"kernel": _t(sd[f"{prefix}.modulation.weight"])},
        }

    for i in range(depth):
        base = f"transformer.layers.{i}"
        p[f"block{i}"] = {
            "attn_norm": mod_norm(f"{base}.0.norm"),
            "to_qkv": {"kernel": _t(sd[f"{base}.0.to_qkv.weight"])},
            "wo": {"kernel": _t(sd[f"{base}.0.wo.weight"])},
            "ff_norm": mod_norm(f"{base}.1.norm"),
            "w1": {"kernel": _t(sd[f"{base}.1.w1.weight"])},
            "w2": {"kernel": _t(sd[f"{base}.1.w2.weight"])},
        }
    p["head_norm"] = mod_norm("head.norm")
    p["head"] = {"kernel": _t(sd["head.head.0.weight"])}
    return p


def _nest(flat: dict) -> dict:
    """{'a/b/c': arr} -> nested params dict."""
    out: dict = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def songunet_state_dict_to_params(state_dict: Mapping[str, Any]) -> dict:
    """Reference SongUNet state_dict -> our flax params
    (swift_tpu.models.songunet.SongUNet).

    Layout rules (reference: src/swift/models/songunet.py:457-757):
      * ModuleDict entries ``enc.{res}_x`` / ``dec.{res}_x`` become flat
        module names ``enc_{res}_x`` / ``dec_{res}_x``;
      * conv weights (O, I, kh, kw) -> HWIO kernels; linear (out, in) -> T;
      * GroupNorm weight/bias -> the nested ``gn`` scale/bias;
      * ``resample_filter`` buffers are constants here — skipped;
      * ``map_noise.freqs`` (FourierEmbedding) -> ``fourier_freqs``.
    """
    flat: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        k = k[len("model."):] if k.startswith("model.") else k
        if "resample_filter" in k:
            continue
        parts = k.split(".")
        if parts[0] in ("enc", "dec"):
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        if parts[0] == "map_noise":  # FourierEmbedding freqs
            flat["fourier_freqs"] = _a(v)
            continue
        leaf = parts[-1]
        prefix = parts[:-1]
        v = np.asarray(v)
        is_norm = prefix and ("norm" in prefix[-1])
        if is_norm:
            name = {"weight": "scale", "bias": "bias"}[leaf]
            flat["/".join(prefix + ["gn", name])] = _a(v)
        elif leaf == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                flat["/".join(prefix + ["kernel"])] = np.ascontiguousarray(
                    np.asarray(v, np.float32).transpose(2, 3, 1, 0)
                )
            else:  # linear (out, in) -> (in, out)
                flat["/".join(prefix + ["kernel"])] = _t(v)
        else:
            flat["/".join(prefix + [leaf])] = _a(v)
    return _nest(flat)


def edm2_state_dict_to_params(state_dict: Mapping[str, Any]) -> dict:
    """Reference EDM2 UNet state_dict -> our flax params
    (swift_tpu.models.edm2.EDM2UNet).

    MPConv stores one ``weight`` of shape (out, in) or (out, in, kh, kw)
    (reference: src/swift/models/edm2.py:126-134); our ``mp_weight`` keeps
    the SAME torch layout (forced weight normalization operates per out-
    channel over the flattened trailing dims; the conv transposes to HWIO
    at apply time). ``emb_fourier.freqs/phases`` are random-at-init buffers
    the reference persists (:85-86) — they must be copied, not re-drawn.
    Scalar gains (emb_gain, out_gain) copy through.
    """
    flat: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        k = k[len("model."):] if k.startswith("model.") else k
        parts = k.split(".")
        if parts[0] in ("enc", "dec"):
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        if parts[-1] == "weight":  # MPConv parameter, layout preserved
            parts = parts[:-1] + ["mp_weight"]
        flat["/".join(parts)] = _a(v)
    return _nest(flat)


def load_reference_checkpoint(
    path: str,
    depth: int = 0,
    key: str = "ema",
    scan_layers: bool = True,
    model_target: str = "SwinV2",
) -> dict:
    """Load a reference ``.pt`` checkpoint and return our params pytree.

    ``model_target``: the config's model ``_target_`` (suffix is enough) —
    routes to the right state_dict converter (SwinV2 / Swin / SongUNet /
    EDM2's UNet), so every reference backbone's checkpoints interchange.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    sd = state[key] if key in state else state
    target = model_target.rsplit(".", 1)[-1]
    if target == "SwinV2":
        return swinv2_state_dict_to_params(sd, depth, scan_layers=scan_layers)
    if target == "Swin":
        return swin_v1_state_dict_to_params(sd, depth)
    if target == "SongUNet":
        return songunet_state_dict_to_params(sd)
    if target == "UNet":
        return edm2_state_dict_to_params(sd)
    raise ValueError(f"no .pt converter for model target {model_target!r}")
