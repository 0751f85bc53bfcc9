"""Device-mesh utilities — the whole distributed backend.

This module replaces the reference's entire communication stack (ezpz +
torch.distributed + NCCL/oneCCL/MPI backend selection + env tuning, see
SURVEY.md §5.8 and reference scripts/aurora-general.sh:26-46) with a single
abstraction: a named ``jax.sharding.Mesh``.

  * data parallelism  = batch-dim sharding over the ``data`` axis
    (gradient psum inserted by XLA — no DDP wrapper, reference
    trainer.py:76-84);
  * ensemble inference = (member, ic) sharding over the same devices
    (replacing the rank round-robin of reference generate.py:79);
  * cross-host metric/loss reduction = jnp means over sharded arrays
    (replacing explicit all_reduce at reference trainer.py:441-443).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` —
the mesh then spans all processes, ICI within a slice and DCN across
slices, with no further configuration.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def maybe_initialize_distributed():
    """Multi-host bootstrap: call ``jax.distributed.initialize()`` when the
    environment indicates a TPU pod / explicit coordinator (replaces the
    reference's ezpz.setup_torch + MPI launch with MASTER_ADDR/RANK env
    plumbing, SURVEY.md §5.8 and reference scripts/aurora-general.sh:58-96).
    No-op on a single host; idempotent.

    Two modes:
      * auto-detected cluster (TPU pod / Megascale): ``initialize()`` with
        no arguments — the cluster plugin fills in coordinator/rank;
      * explicit coordinator (the reference's ``MASTER_ADDR`` pattern):
        ``SWIFT_COORDINATOR`` (or ``JAX_COORDINATOR_ADDRESS``) +
        ``SWIFT_NUM_PROCESSES`` + ``SWIFT_PROCESS_ID`` pin all three —
        this is how the 2-process CPU tier is exercised in CI
        (tests/test_multiprocess.py) and how a bare-metal launch without a
        cluster resolver bootstraps.
    """
    import os

    if os.environ.get("SWIFT_NO_DIST_INIT"):
        return False
    coord = (
        os.environ.get("SWIFT_COORDINATOR")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    multi = coord is not None or (
        os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    )
    if not multi:
        return False
    kwargs = {}
    nproc = os.environ.get("SWIFT_NUM_PROCESSES")
    pid = os.environ.get("SWIFT_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except (RuntimeError, ValueError):
        return False  # already initialized or single-process


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Create (and cache) the global mesh.

    Defaults to a 1-D ``data`` mesh over all devices. ``axis_sizes`` may use
    -1 for "remaining devices" (at most one -1).
    """
    global _MESH
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [n]
        axis_sizes[0] = n // int(np.prod(axis_sizes[1:])) if len(axis_names) > 1 else n
        axis_sizes = [n] if len(axis_names) == 1 else axis_sizes
    sizes = list(axis_sizes)
    if -1 in sizes:
        rest = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // rest
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    mesh = Mesh(devices.reshape(sizes), tuple(axis_names))
    _MESH = mesh
    return mesh


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def shard_batch(batch, mesh: Optional[Mesh] = None, axis: str = "data"):
    """Device-put a host batch with the leading dim sharded over ``axis``.

    ``batch`` is the process-LOCAL batch: under multi-process (pod)
    execution each process passes only the rows its own sampler loaded
    (``global_batch // process_count`` of them — the reference's rank
    round-robin sampler contract, reference samplers.py/train.py) and the
    global array is the concatenation of the per-process local batches in
    ``axis``-order, assembled zero-copy via
    ``jax.make_array_from_process_local_data``. Single-process: local ==
    global. Every loaded row is used exactly once and the effective global
    batch is ``sum(local batches)`` — per-rank loading feeds a true global
    batch (r4 advisor, high).
    """
    mesh = mesh or get_mesh()
    multiprocess = jax.process_count() > 1
    if multiprocess:
        # global leading dim = local_rows * (data-axis size / #data-axis
        # blocks that have a device on THIS process). For the standard
        # batch-leading mesh layouts this is local_rows * process_count.
        ax = mesh.axis_names.index(axis)
        blocks = np.moveaxis(mesh.devices, ax, 0)
        me = jax.process_index()
        local_blocks = sum(
            1 for i in range(blocks.shape[0])
            if any(d.process_index == me for d in np.ravel(blocks[i]))
        )
        assert local_blocks and mesh.shape[axis] % local_blocks == 0, (
            f"process {me} owns {local_blocks} of {mesh.shape[axis]} "
            f"{axis!r}-axis blocks — uneven process layout"
        )
        scale = mesh.shape[axis] // local_blocks

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            spec, gshape = P(), x.shape
        else:
            spec = P(axis, *([None] * (x.ndim - 1)))
            gshape = (x.shape[0] * scale,) + x.shape[1:] if multiprocess else x.shape
        ns = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(ns, x, gshape)
        return jax.device_put(x, ns)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Optional[Mesh] = None):
    """Fully replicate a pytree over the mesh (multi-process safe: every
    process must hold the same host values)."""
    mesh = mesh or get_mesh()
    sharding = NamedSharding(mesh, P())

    def put(x):
        if jax.process_count() > 1:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)
