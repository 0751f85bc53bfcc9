"""Training entry point: ``python -m swift_tpu.train experiment=... [k=v ...]``.

CLI-compatible re-design of the reference entry point
(reference: src/swift/train.py:135-346): same Hydra-style overrides, run-dir
layout (``results/<experiment>/<run-id>`` with the composed config saved to
``.hydra/config.yaml`` for resume/generate interchangeability), resume and
distillation flows, per-architecture optimizer param grouping, and trainer
construction.

TPU differences: process/dist init is ``jax.distributed.initialize`` (when
multi-host) + one mesh (replacing ezpz.setup_torch, :137); batch sharding
replaces DDP; the loader is the thread prefetcher from data.pipeline.
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import sys
from datetime import datetime
from glob import glob

import jax
import numpy as np

from swift_tpu import config as cfglib
from swift_tpu import factory
from swift_tpu.data.pipeline import BatchLoader
from swift_tpu.data.samplers import DeltaBatchSampler, InfiniteSampler
from swift_tpu.models.precond import Network
from swift_tpu.parallel.mesh import make_mesh, shard_batch
from swift_tpu.training.trainer import Trainer, swin_flop_count
from swift_tpu.utils.checkpoint import get_ckpt_num, latest_checkpoint, load_checkpoint
from swift_tpu.utils.io import get_logger, is_main_process, log0

logger = get_logger(__name__)


def string_to_int(s: str) -> int:
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % (1 << 31)


def resume_setup(cfg: dict, run_dir: str):
    """Reload a prior run's config + latest checkpoint (reference
    train.py:44-99); apply finetune hard-overrides and extend total_kimg."""
    if cfg.get("resume") is None:
        return cfg, None

    finetune = cfg.get("finetune")

    prev = cfg["resume"]
    if not os.path.isdir(prev):
        prev = os.path.join(os.path.dirname(run_dir), cfg["resume"])
    assert os.path.isdir(prev), f"{prev} is not a directory"

    prev_cfg = cfglib.load_config(os.path.join(prev, ".hydra", "config.yaml"))
    ckpt = latest_checkpoint(os.path.join(prev, "checkpoints"))
    assert ckpt, f"No checkpoints in {os.path.join(prev, 'checkpoints')}"

    if is_main_process():
        src = os.path.join(prev, ".hydra")
        dst = os.path.join(run_dir, ".hydra")
        # in-place resume (RUN_ID == resume id) copies onto itself — skip.
        if os.path.isdir(src) and not os.path.samefile(
            os.path.dirname(src), os.path.dirname(dst)
        ):
            shutil.copytree(src, dst, dirs_exist_ok=True)

    # run-control flags always come from the CURRENT invocation, not the
    # resumed run's saved config.
    for key in ("dry_run", "resume", "distill"):
        if key in cfg:
            prev_cfg[key] = cfg[key]

    if finetune is not None:
        # hard overlay of the finetune-composed groups onto the resumed cfg
        # (reference :74-96). Our composition put them at global scope.
        for key in ("loss", "optimizer", "finetune"):
            if key in cfg:
                prev_cfg[key] = cfg[key]
        if cfg["finetune"].get("name") == "multistep":
            prev_cfg["trainer"]["total_kimg"] = get_ckpt_num(ckpt) + sum(
                iv["kimg"] for iv in cfg["finetune"].get("intervals", [])
            )
            prev_cfg["trainer"]["lr_cosine_anneal"] = False
            prev_cfg["trainer"]["checkpoint_ticks"] = 200
            prev_cfg["trainer"]["val_ticks"] = 50
        if is_main_process():
            cfglib.save_config(prev_cfg, os.path.join(run_dir, ".hydra", "config.yaml"))

    log0(f"Resuming from {ckpt}")
    return prev_cfg, ckpt


def distill_setup(cfg: dict, dataset) -> Network | None:
    """Load a frozen EMA teacher from another run (reference train.py:102-132)."""
    if cfg.get("distill") is None:
        return None
    run_dir = cfg["distill"]
    tcfg = cfglib.load_config(os.path.join(run_dir, ".hydra", "config.yaml"))
    ckpt = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    assert ckpt, f"No checkpoints in {os.path.join(run_dir, 'checkpoints')}"
    log0(f"Loading distillation model: {ckpt}")

    precond = factory.build_precond(
        tcfg["precond"],
        tcfg["model"],
        dataset.img_resolution,
        dataset.n_target_channels,
        dataset.n_condition_channels,
    )
    params = precond.init(jax.random.PRNGKey(0))
    restored = load_checkpoint(ckpt, {"ema": params})
    return Network(precond, restored["ema"])


def main(argv=None):
    from swift_tpu.parallel.mesh import maybe_initialize_distributed
    from swift_tpu.utils.io import setup_compilation_cache, start_device_keepalive

    maybe_initialize_distributed()
    setup_compilation_cache()
    start_device_keepalive()
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = cfglib.compose("train", overrides)

    run_id = os.environ.get("RUN_ID") or datetime.now().strftime("%Y%m%d_%H%M%S")
    run_dir = os.path.join("results", cfg["experiment_name"], run_id)
    if is_main_process():
        os.makedirs(run_dir, exist_ok=True)
        cfglib.save_config(cfg, os.path.join(run_dir, ".hydra", "config.yaml"))
        from swift_tpu.utils.wandb_utils import setup_wandb

        setup_wandb("swift", config=cfg)
    log0(f"Results directory: {run_dir}")

    cfg, ckpt = resume_setup(cfg, run_dir)
    if ckpt is not None:
        # the resume swapped in the prior run's config (reference behavior);
        # explicit CLI value overrides still win on top of it.
        from swift_tpu.config import _parse_value, _set_path

        for ov in overrides:
            key, _, raw = ov.partition("=")
            key = key.lstrip("+")
            if raw and "." in key or key in ("seed", "dry_run"):
                _set_path(cfg, key, _parse_value(raw))
    if cfg.get("finetune") is not None and ckpt is None:
        log0("ERROR: must have resume path to finetune")
        return 1

    seed = int(cfg["seed"]) + string_to_int(run_id)
    np.random.seed((seed * jax.process_count() + jax.process_index()) % (1 << 31))

    mesh_axes = tuple(cfg.get("system", {}).get("mesh", {}).get("axes", ["data"]))
    mesh_sizes = cfg.get("system", {}).get("mesh", {}).get("sizes")
    n_devices = jax.device_count()
    if (
        mesh_axes == ("data",)
        and mesh_sizes in (None, [-1], (-1,))
        # single-host dev-mesh guard only: under multi-process execution the
        # global device order groups by process, so clamping to a devices[]
        # prefix could strand a process with zero mesh devices.
        and jax.process_count() == 1
    ):
        # small-config guard: a global batch that does not divide the device
        # count (e.g. the tiny synthetic experiment on an 8-device dev mesh)
        # must not die in an opaque device_put error — clamp the data axis to
        # the largest batch divisor and leave the rest of the devices idle.
        gb = int(cfg["data"]["batch_size"])
        dp = math.gcd(gb, n_devices)
        if dp != n_devices:
            log0(
                f"WARNING: global batch {gb} does not divide {n_devices} "
                f"devices; using a {dp}-device data mesh ({n_devices - dp} "
                "devices idle). Raise data.batch_size to use the full mesh."
            )
        mesh_sizes = [dp]
        mesh = make_mesh(mesh_axes, mesh_sizes, devices=jax.devices()[:dp])
    else:
        mesh = make_mesh(mesh_axes, mesh_sizes)
    log0(f"Mesh: {mesh} ({n_devices} devices)")

    log0("Loading dataset...")
    dataset = factory.build_dataset(cfg["data"])
    sampler = InfiniteSampler(
        dataset,
        rank=jax.process_index(),
        num_replicas=jax.process_count(),
        shuffle=True,
        seed=seed,
    )

    global_batch = int(cfg["data"]["batch_size"])
    local_batch = global_batch // jax.process_count()
    finetune = cfg.get("finetune")
    multistep_steps = 0
    batch_sampler = None
    if finetune is not None:
        batch_sampler = DeltaBatchSampler(
            sampler, local_batch, dataset.intervals, seed=seed
        )
        multistep_steps = max(iv["steps"] for iv in finetune.get("intervals", [{"steps": 1}]))
    loader = BatchLoader(
        dataset,
        sampler,
        local_batch,
        num_workers=int(cfg["data"].get("data_workers", 4)),
        multistep_forcings=multistep_steps,
        batch_sampler=batch_sampler,
    )

    log0("Constructing network...")
    tp_on = "model" in mesh.axis_names and mesh.shape["model"] > 1
    precond = factory.build_precond(
        cfg["precond"],
        cfg["model"],
        dataset.img_resolution,
        dataset.n_target_channels,
        dataset.n_condition_channels,
        # under TP the model carries activation sharding constraints so XLA
        # partitions the window reshapes instead of rematerializing.
        mesh=mesh if tp_on else None,
    )

    log0("Constructing loss function...")
    if cfg["loss"]["_target_"].endswith("SCMLoss") and cfg.get("distill") is not None:
        cfg["loss"]["distillation"] = True
    teacher = distill_setup(cfg, dataset)
    loss_fn = factory.build_loss(cfg["loss"], precond, dataset)

    log0("Constructing optimizer...")
    resume_kimg = get_ckpt_num(ckpt) if ckpt else 0
    params_template = jax.eval_shape(
        lambda: precond.init(jax.random.PRNGKey(0))
    )
    optimizer, lr_fn = factory.build_optimizer(
        cfg["optimizer"], cfg["trainer"], global_batch, params_template,
        resume_kimg=resume_kimg, mesh=mesh,
    )

    # validation rollout data (reference train.py:222-260)
    val_dataset = None
    val_batches = None
    tcfg = cfg["trainer"]
    if tcfg.get("val_ticks") is not None:
        try:
            val_dataset = factory.build_rollout_dataset(
                cfg["data"], int(tcfg.get("val_target_interval", 56)), split="val"
            )
            val_bs = int(cfg["data"].get("val_local_batch_size", 4))
            val_sampler = InfiniteSampler(
                val_dataset, rank=jax.process_index(),
                num_replicas=jax.process_count(), shuffle=True, seed=seed,
            )

            def val_batches():
                it = iter(val_sampler)
                while True:
                    idxs = [next(it) for _ in range(val_bs)]
                    samples = [val_dataset[i] for i in idxs]
                    X = np.stack([s[0] for s in samples])
                    TS = np.stack([s[1] for s in samples])
                    yield X, TS, np.asarray(idxs)
        except (AssertionError, FileNotFoundError) as e:
            log0(f"No validation split available ({e}); disabling val.")
            val_dataset = None
            val_batches = None

    # analytic FLOP count for train/tflops (reference train.py:328)
    flop_count = None
    if cfg["model"]["_target_"].endswith(("SwinV2", "Swin")):
        flop_count = swin_flop_count(
            dataset.img_resolution,
            global_batch,
            int(cfg["model"]["depth"]),
            dataset.n_target_channels + dataset.n_condition_channels,
            int(cfg["model"]["dim"]),
            int(8 / 3.0 * int(cfg["model"]["dim"])),
            tuple(cfg["model"]["patch_size"]),
            tuple(cfg["model"]["window_size"]),
        )

    trainer = Trainer(
        precond,
        optimizer,
        loss_fn,
        global_batch_size=global_batch,
        total_kimg=int(tcfg["total_kimg"]),
        ema_halflife_kimg=int(tcfg.get("ema_halflife_kimg", 500)),
        ema_rampup_ratio=tcfg.get("ema_rampup_ratio", 0.05),
        kimg_per_tick=int(tcfg.get("kimg_per_tick", 50)),
        checkpoint_ticks=tcfg.get("checkpoint_ticks"),
        val_ticks=tcfg.get("val_ticks"),
        val_target_interval=int(tcfg.get("val_target_interval", 56)),
        val_variables=tcfg.get("val_variables"),
        val_crps_members=int(tcfg.get("val_crps_members", 0) or 0),
        solver_kwargs=cfg.get("solver"),
        finetune_kwargs=finetune,
        teacher=teacher,
        run_dir=run_dir,
        ckpt=ckpt,
        flop_count=flop_count,
        seed=seed,
        profile=bool(tcfg.get("profile", False)),
        lr_fn=lr_fn,
        grad_accum=int(tcfg.get("grad_accum", 1) or 1),
    )

    # tensor parallelism: when the configured mesh carries a model axis,
    # shard the parameter matrices over it (parallel/sharding.py rules).
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        from swift_tpu.parallel.sharding import shard_params

        log0(f"Sharding parameters over model axis ({mesh.shape['model']}-way TP)")
        trainer.state = trainer.state._replace(
            params=shard_params(trainer.state.params, mesh),
            ema=shard_params(trainer.state.ema, mesh),
        )

    if cfg.get("dry_run"):
        log0("Dry run requested; exiting before training.")
        return 0

    class ShardedLoader:
        """Shards host batches over the mesh; forwards set_offset to the
        sampler for multistep finetune (reference trainer.py:352-376)."""

        def set_offset(self, steps: int):
            sampler.set_offset(steps)

        def __iter__(self):
            for batch in loader:
                yield shard_batch(batch, mesh)

    log0("Training...")
    trainer.train(ShardedLoader(), val_batches, val_dataset)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
