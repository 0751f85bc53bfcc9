"""Parameter sharding rules — tensor parallelism as GSPMD annotations.

The reference never implemented TP/SP/PP (stubs only, SURVEY.md §2.3); on
TPU, tensor parallelism is a set of parameter shardings over a 2-D
``(data, model)`` mesh — XLA inserts the all-gathers/reduce-scatters.

SwinV2 rules (Megatron-style column/row split per block):
  * ``to_qkv`` / ``w1`` kernels: output features sharded over ``model``
    (column-parallel; the head and hidden dims split across devices);
  * ``wo`` / ``w2`` kernels: input features sharded over ``model``
    (row-parallel; XLA emits one psum per block pair);
  * everything else (embeddings, norms, modulation, head) replicated.

Scan-over-layers parameters carry a leading layer axis, so the feature
axes shift by one.

The fused Pallas attention kernels compose with these shardings:
``sharded_block_attention`` (ops/pallas_block_attention.py) shard_maps the
block kernel over (data, model) with head chunks on ``model``, and the
per-head kernel has an equivalent wrapper in ops/pallas_attention.py —
``use_pallas`` stays on under TP.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf, axis: str) -> P:
    names = [str(getattr(p, "key", p)) for p in path]
    joined = "/".join(names)
    stacked = "pairs" in joined  # leading layer axis from nn.scan
    off = 1 if stacked else 0

    def spec(*entries):
        lead = (None,) * off
        return P(*lead, *entries)

    if names[-1] == "kernel":
        if "to_qkv" in joined or "w1" in joined:
            # column parallel: (in, out) -> out over `axis`
            return spec(None, axis)
        if "wo" in joined or "w2" in joined:
            # row parallel: (in, out) -> in over `axis`
            return spec(axis, None)
    return P()  # replicated


def swinv2_param_shardings(params: Any, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings implementing TP for SwinV2 params.

    Falls back to full replication for parameters whose sharded dimension
    does not divide the mesh axis size.
    """
    n = mesh.shape[axis]

    def make(path, leaf):
        spec = _spec_for(path, leaf, axis)
        # validate divisibility; replicate otherwise.
        for dim, entry in enumerate(spec):
            if entry == axis and leaf.shape[dim] % n != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(make, params)


def shard_params(params: Any, mesh: Mesh, axis: str = "model"):
    """device_put params according to the TP rules."""
    shardings = swinv2_param_shardings(params, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def pad_lat_to_grid(x, patch: int, window: int, lat_axis: int = 1):
    """Pad the latitude axis up to a multiple of ``patch·window`` (edge
    replication toward the pole) so a 0.25° WB2 grid (721 lat rows) windows
    cleanly: 721 -> 736 for patch 2 × window 16. Returns (padded, orig_len);
    crop model outputs back with ``crop_lat(y, orig_len, lat_axis)``.

    This is the non-divisible-latitude strategy for the spatial-sharding
    (CP-analogue) inference path (SURVEY.md §5.7): windows stay aligned to
    shards, and the pole padding only sees edge-replicated rows.
    """
    m = patch * window
    H = x.shape[lat_axis]
    pad = (-H) % m
    if pad == 0:
        return x, H
    widths = [(0, 0)] * x.ndim
    widths[lat_axis] = (0, pad)
    # jnp.pad is jit-traceable (works on host numpy arrays too), so the
    # padding can live inside the compiled rollout.
    return jnp.pad(jnp.asarray(x), widths, mode="edge"), H


def crop_lat(y, orig_len: int, lat_axis: int = 1):
    """Inverse of ``pad_lat_to_grid`` on model outputs."""
    sl = [slice(None)] * y.ndim
    sl[lat_axis] = slice(0, orig_len)
    return y[tuple(sl)]


def spatial_sharding(mesh: Mesh, ndim: int, lat_dim: int = 1,
                     axis: str = "data") -> NamedSharding:
    """Sequence/spatial parallelism: shard the latitude axis of an NHWC
    tensor over the mesh. Window attention is local in space, so GSPMD
    partitions the whole forward with only halo exchanges at the cyclic
    shifts — the window-parallel CP analogue sketched in SURVEY.md §5.7
    (how 0.25° grids scale past one chip's batch-1 latency). Verified to
    reproduce the replicated forward exactly (tests/test_tensor_parallel).
    """
    spec = [None] * ndim
    spec[lat_dim] = axis
    return NamedSharding(mesh, P(*spec))
