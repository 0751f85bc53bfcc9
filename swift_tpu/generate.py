"""Ensemble inference CLI: ``python -m swift_tpu.generate --input <run_dir>
--members 12 --steps 60 ...`` — argument parity with the reference
(reference: src/swift/generate.py:23-43,160-288).

Loads the run's saved config (``.hydra/config.yaml``), the latest (or named)
checkpoint's EMA weights, evenly-spaced test-split initial conditions, and
writes a WB2-layout zarr (or numpy) forecast store. The rollout itself is
the mesh-sharded compiled ensemble engine (swift_tpu.sampling.ensemble)
instead of the reference's rank round-robin + Python step loop.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from swift_tpu import config as cfglib
from swift_tpu import factory
from swift_tpu.data.constants import compress_variables
from swift_tpu.data.samplers import AttributeSubset
from swift_tpu.parallel.mesh import make_mesh
from swift_tpu.sampling.ensemble import EnsembleRollout
from swift_tpu.sampling.factory import param_sampler_factory
from swift_tpu.utils import zarr_lite
from swift_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from swift_tpu.utils.io import create_empty_numpy, create_forecast_zarr, log0

parser = argparse.ArgumentParser()
parser.add_argument("--input", type=str, required=True, help="Input directory")
parser.add_argument("--checkpoint", type=str, default=None,
                    help="Checkpoint name (default: latest)")
parser.add_argument("--members", type=int, default=1, help="Number of ensemble members")
parser.add_argument("--steps", type=int, default=8, help="Number of prediction steps")
parser.add_argument("--batch", type=int, default=32, help="IC batch size")
parser.add_argument("--samples", type=int, default=-1, help="Number of samples to use")
parser.add_argument("--interval", type=int, default=6, choices=[6, 12, 24],
                    help="Interval in hours")
parser.add_argument("--dump", type=str, default="zarr", choices=["zarr", "numpy"],
                    help="Output format")
parser.add_argument("--segment", type=int, default=10,
                    help="Rollout steps per compiled segment (device buffer bound)")
parser.add_argument("--solver", type=str, default="scm",
                    choices=["scm", "edm", "dpm", "2s"])
parser.add_argument("--num-solver-steps", type=int, default=1)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--pp", type=int, default=0,
                    help="Pipeline-parallel stages for the solver net (0=off). "
                    "Devices split as (data=-1, pipe=PP); use when the model's "
                    "layer stack outgrows one chip's HBM — otherwise pure "
                    "(member x ic) data sharding is faster. The reference "
                    "planned but never shipped this (generating/diffusion.py "
                    "'TODO: PP Prediction').")
parser.add_argument("--int8", action="store_true",
                    help="Dynamically-quantized int8 qkv/FFN matmuls for the "
                    "forecast (2x MXU rate on v5e+). Accuracy-affecting: "
                    "opt-in until a real-data RMSE/CRPS A/B blesses it "
                    "(tests/test_quant.py gates it on synthetic forecasts).")
parser.add_argument("--output", type=str, default=None,
                    help="Output directory (default: "
                    "<input>/output/<checkpoint>/). Lets two runs from the "
                    "same checkpoint coexist, e.g. an fp-vs-int8 A/B.")
parser.add_argument("--pp-micro", type=int, default=None,
                    help="Microbatches per pipeline round-trip (default: PP; "
                    "more microbatches shrink the (PP-1)/(M+PP-1) bubble; "
                    "members*batch must divide pp_micro*data_size)")


def _rank0_barrier(fn, *fn_args, **fn_kwargs):
    """Create the shared store on process 0 only, then barrier — the
    reference creates stores rank-0 behind an MPI barrier
    (reference generate.py:241-252, utils/helpers.py:5-8)."""
    import jax

    if jax.process_index() == 0:
        fn(*fn_args, **fn_kwargs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("swift_tpu.generate.build_store")


def build_store(args, dataset, indices, odir, filename):
    if args.dump == "numpy":
        ofile = os.path.join(odir, f"{filename}.npy")
        _rank0_barrier(create_empty_numpy, ofile, dataset, args.members, args.steps)
        store = np.lib.format.open_memmap(ofile, mode="r+")

        def write_fn(ic_start, m, lead_start, chunk):
            # chunk: (B, S, H, W, C) physical -> store is (n, M, steps+1, C, H, W)
            b, s = chunk.shape[0], chunk.shape[1]
            store[ic_start : ic_start + b, m, lead_start : lead_start + s] = (
                chunk.transpose(0, 1, 4, 2, 3)
            )

        def finalize():
            store.flush()

        return ofile, write_fn, finalize

    ofile = os.path.join(odir, f"{filename}.zarr")
    _rank0_barrier(
        create_forecast_zarr,
        ofile, dataset, args.members, args.steps,
        interval=args.interval, batch=args.batch, indices=indices,
    )
    group = zarr_lite.open_group(ofile)
    var_slices = {}
    counter = 0
    for var, levels in compress_variables(dataset.variables).items():
        n = max(len(levels), 1)
        var_slices[var] = (counter, counter + n, bool(levels))
        counter += n

    def write_fn(ic_start, m, lead_start, chunk):
        b, s = chunk.shape[0], chunk.shape[1]
        for var, (lo, hi, has_levels) in var_slices.items():
            if has_levels:
                # (B, S, H, W, L) -> (B, S, L, H, W)
                data = chunk[..., lo:hi].transpose(0, 1, 4, 2, 3)
                group[var][
                    ic_start : ic_start + b, m, lead_start : lead_start + s
                ] = data
            else:
                group[var][
                    ic_start : ic_start + b, m, lead_start : lead_start + s
                ] = chunk[..., lo]

    def finalize():
        group.consolidate_metadata()

    return ofile, write_fn, finalize


def main(args):
    from swift_tpu.parallel.mesh import maybe_initialize_distributed
    from swift_tpu.utils.io import setup_compilation_cache, start_device_keepalive

    maybe_initialize_distributed()
    setup_compilation_cache()
    start_device_keepalive()
    cfg = cfglib.load_config(os.path.join(args.input, ".hydra", "config.yaml"))
    cfg = cfglib.resolve_interpolations(cfg)

    log0("Loading dataset...")
    dataset = factory.build_dataset(cfg["data"], split="test")
    if args.samples == -1:
        indices = list(range(len(dataset)))
    else:
        indices = np.linspace(
            0,
            len(dataset) - 1 - (args.steps * args.interval // 6),
            num=args.samples,
            dtype=int,
        ).tolist()
    subset = AttributeSubset(dataset, indices)

    log0("Constructing network...")
    if args.int8:
        cfg.setdefault("model", {})["quant"] = "int8"
    precond = factory.build_precond(
        cfg["precond"], cfg["model"],
        dataset.img_resolution,
        dataset.n_target_channels,
        dataset.n_condition_channels,
        sigma_max_override=float("inf"),
    )
    import jax

    params = precond.init(jax.random.PRNGKey(0))
    if args.checkpoint is not None:
        name = args.checkpoint
        if not (name.endswith(".npz") or name.endswith(".pt")):
            name += ".npz"
        ckpt = name if os.path.exists(name) else os.path.join(
            args.input, "checkpoints", name
        )
        if not os.path.exists(ckpt):
            raise ValueError(f"Specified checkpoint {ckpt} does not exist")
        ckpt_basename = os.path.splitext(os.path.basename(ckpt))[0]
    else:
        ckpt = latest_checkpoint(os.path.join(args.input, "checkpoints"))
        assert ckpt, f"No checkpoints in {os.path.join(args.input, 'checkpoints')}"
        ckpt_basename = "latest"
    log0(f"Loading checkpoint: {ckpt}")
    if ckpt.endswith(".pt"):
        # reference torch checkpoint: EMA state_dict -> flax params
        # (checkpoint interchange, BASELINE.md north star).
        from swift_tpu.models.convert import load_reference_checkpoint

        model_params = load_reference_checkpoint(
            ckpt, depth=int(cfg["model"].get("depth", 0)),
            scan_layers="pairs" in params,
            model_target=cfg["model"].get("_target_", "SwinV2"),
        )
        ema_params = model_params
    else:
        ema_params = load_checkpoint(ckpt, {"ema": params})["ema"]

    pp = args.pp
    if not pp:
        # a run trained/saved with system/tpu-pp.yaml carries the pipe axis
        # in its config; honor it unless --pp overrides.
        sys_mesh = cfg.get("system", {}).get("mesh", {})
        axes = list(sys_mesh.get("axes", []))
        if "pipe" in axes:
            sizes = list(sys_mesh.get("sizes", []))
            if sizes and len(sizes) != len(axes):
                raise ValueError(
                    f"system.mesh sizes {sizes} does not match axes {axes}"
                )
            pp = int(sizes[axes.index("pipe")]) if sizes else 2
            if pp == -1:
                # the 'remaining devices' convention (make_mesh / tpu-pp.yaml
                # uses -1 on the data axis, but a config may put it on pipe).
                rest = int(np.prod([s for s in sizes if s != -1]))
                pp = jax.device_count() // rest
            if args.pp_micro is None:
                args.pp_micro = (cfg.get("system", {}).get("pipeline", {})
                                 or {}).get("n_micro")
    if pp and pp > 1:
        # pipeline-parallel prediction: the block-pair stack shards over a
        # "pipe" axis; (member x ic) still shards over "data".
        from swift_tpu.parallel.pipeline import pipelined_precond

        mesh = make_mesh(("data", "pipe"), (-1, pp))
        precond = pipelined_precond(
            precond, mesh, n_micro=args.pp_micro, data_axis="data"
        )
    else:
        mesh = make_mesh(("data",))
    log0(f"Mesh: {mesh}")

    odir = args.output or os.path.join(args.input, "output", ckpt_basename)
    os.makedirs(odir, exist_ok=True)
    filename = (
        f"output-{len(subset)}i-{args.steps}s-{args.members}m-{args.interval}h"
    )
    log0(f"{len(subset)} initials for {args.steps} steps over {args.members} members")
    ofile, write_fn, finalize = build_store(args, subset, indices, odir, filename)

    log0("Setting up sampler...")
    solver_kwargs = {
        "num_steps": args.num_solver_steps,
        "sigma_min": 0.02,
        "sigma_max": 200.0,
        "auxiliary": args.interval / 10.0,
    }
    sampler = param_sampler_factory(args.solver, precond, **solver_kwargs)

    engine = EnsembleRollout(
        sampler, ema_params, dataset, args.members, args.steps,
        interval=args.interval, segment=args.segment, mesh=mesh,
        base_seed=args.seed,
    )

    log0("Rolling out samples...")
    start_t = time.time()
    nv = len(dataset.variables)
    for b0 in range(0, len(subset), args.batch):
        batch_idx = indices[b0 : b0 + args.batch]
        X0 = np.stack(
            [
                np.asarray(
                    dataset.standardize_x(
                        dataset._load_file(dataset.files[i], dataset.variables),
                        args.interval,
                    )
                )
                for i in batch_idx
            ]
        ).astype(np.float32)
        forcings = None
        if dataset.forcings:
            forcings = np.stack(
                [
                    np.stack(
                        [
                            np.asarray(
                                dataset.standardize_x(
                                    dataset.get_forcings(
                                        min(
                                            int(i) + int(s * args.interval // 6),
                                            len(dataset.files) - 1,
                                        )
                                    ),
                                    args.interval,
                                )
                            )
                            for s in range(args.steps)
                        ]
                    )
                    for i in batch_idx
                ]
            ).astype(np.float32)
        engine.run(X0, forcings, b0, write_fn)
    wall = time.time() - start_t
    finalize()

    n_forecast_steps = len(subset) * args.members * args.steps
    per_chip = n_forecast_steps / wall / max(1, jax.local_device_count())
    log0(f"Done! Took {wall:.3f} seconds "
         f"({n_forecast_steps} forecast steps, {per_chip:.2f} steps/sec/chip).")
    log0(f"Output saved to: {ofile}")
    return ofile


def cli(argv=None):
    """Console-script entry (``swift-generate``)."""
    main(parser.parse_args(argv))


if __name__ == "__main__":
    main(parser.parse_args())
