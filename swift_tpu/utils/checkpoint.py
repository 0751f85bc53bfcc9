"""Checkpointing: pytree <-> single-file .npz archives + torch .pt import.

Format parity notes (reference trainer.py:522-535): the reference saves one
``checkpoint-{kimg:06d}.pt`` dict {ema, net, optimizer, scaler}, rank-0
only, with kimg encoded in the filename and parsed on resume
(trainer.py:110). We keep the same naming scheme
(``checkpoint-{kimg:06d}.npz``), store {params, ema, opt_state} as a
flattened pytree, and parse kimg identically. The ``.pt`` importer maps the
reference state_dict onto our parameter pytree for checkpoint
interchangeability (BASELINE.md north star).
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (arbitrarily nested dict/NamedTuple/list of arrays)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def _restack_layers(flat: dict[str, np.ndarray], want_pairs: bool) -> dict:
    """Convert between the unrolled ``block{i}/...`` transformer layout and
    the scan-over-layers ``pairs/{even,odd}/...`` layout (stacked leading
    axis), so checkpoints stay loadable across the two model configurations."""
    import re

    out = dict(flat)
    if want_pairs:
        groups: dict[str, dict[int, np.ndarray]] = {}
        for k in list(out):
            m = re.match(r"(.*?)block(\d+)/(.*)", k)
            if m:
                prefix, i, rest = m.group(1), int(m.group(2)), m.group(3)
                groups.setdefault(f"{prefix}|{rest}", {})[i] = out.pop(k)
        for gk, by_layer in groups.items():
            prefix, rest = gk.split("|", 1)
            evens = [by_layer[i] for i in sorted(by_layer) if i % 2 == 0]
            odds = [by_layer[i] for i in sorted(by_layer) if i % 2 == 1]
            if evens:
                out[f"{prefix}pairs/even/{rest}"] = np.stack(evens, 0)
            if odds:
                out[f"{prefix}pairs/odd/{rest}"] = np.stack(odds, 0)
    else:
        for k in list(out):
            m = re.match(r"(.*?)pairs/(even|odd)/(.*)", k)
            if m:
                prefix, par, rest = m.group(1), m.group(2), m.group(3)
                stacked = out.pop(k)
                base = 0 if par == "even" else 1
                for j in range(stacked.shape[0]):
                    out[f"{prefix}block{base + 2 * j}/{rest}"] = stacked[j]
    return out


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (same flattened keys).
    Transparently converts between unrolled and scan-over-layers SwinV2
    transformer layouts."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    want_keys = {
        "/".join(_path_str(p) for p in pe) for pe, _ in paths
    }
    if not want_keys <= set(flat):
        wants_pairs = any("/pairs/" in k or k.startswith("pairs/") for k in want_keys)
        has_pairs = any("/pairs/" in k or k.startswith("pairs/") for k in flat)
        if wants_pairs != has_pairs:
            flat = _restack_layers(flat, want_pairs=wants_pairs)
    leaves = []
    for path_elems, leaf in paths:
        key = "/".join(_path_str(p) for p in path_elems)
        if key not in flat:
            raise KeyError(f"checkpoint missing key: {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs template {np.shape(leaf)}"
            )
        # read dtype WITHOUT np.asarray(leaf): device-resident template
        # leaves would each be fetched to host (a ~1 GB transfer for the
        # flagship through the 22 MB/s dev tunnel) just for their dtype.
        dt = getattr(leaf, "dtype", None)
        leaves.append(arr.astype(dt) if dt is not None else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def get_ckpt_num(path: str) -> int:
    """Parse kimg from checkpoint-{kimg}.{ext} (reference helpers.py:11-14)."""
    m = re.search(r"checkpoint-(\d+)", os.path.basename(path))
    if not m:
        raise ValueError(f"cannot parse checkpoint number from {path}")
    return int(m.group(1))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    paths = glob(os.path.join(ckpt_dir, "checkpoint-*.npz"))
    if not paths:
        return None
    return sorted(paths, key=get_ckpt_num)[-1]
