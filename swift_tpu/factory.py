"""Builders: config dict -> framework objects (the ``_target_`` registry).

Replaces Hydra's arbitrary ``instantiate`` (reference train.py:173,212-220,
313,322) with an explicit registry keyed on the reference ``_target_``
strings, so reference YAML configs work unmodified while construction stays
type-checked and import-safe.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax

from swift_tpu.data.era5 import ERA5Dataset, ERA5RollOutDataset
from swift_tpu.data.standardize import Standardizer
from swift_tpu.models.precond import BasePrecond, EDMPrecond, PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.training.loss import (
    CRPSLoss, EDMLoss, MSELoss, SCMLoss, TrigFlowLoss,
)
from swift_tpu.training.optimizers import mars, muon_with_aux_adam
from swift_tpu.training.trainer import (
    adamw_decay_mask, lr_schedule, muon_param_labels,
)


def _suffix(target: str) -> str:
    return target.rsplit(".", 1)[-1]


def _infinity(v):
    if v in ("inf", ".inf", "Infinity", None):
        return float("inf")
    return float(v)


# ----------------------------------------------------------------------------
# datasets


def build_dataset(data_cfg: dict, split: Optional[str] = None, **extra) -> ERA5Dataset:
    ds_cfg = dict(data_cfg["dataset"])
    target = _suffix(ds_cfg.pop("_target_", "ERA5Dataset"))
    kwargs = dict(
        root=ds_cfg["root"],
        variables=list(ds_cfg["variables"]),
        forcings=list(ds_cfg.get("forcings", []) or []),
        intervals=list(ds_cfg.get("intervals", [6, 12, 24])),
        split=split or ds_cfg.get("split", "train"),
        residual=bool(ds_cfg.get("residual", False)),
    )
    kwargs.update(extra)
    if target == "ERA5RollOutDataset":
        return ERA5RollOutDataset(**kwargs)
    if target == "ERA5Dataset":
        return ERA5Dataset(**kwargs)
    raise ValueError(f"unknown dataset target: {target}")


def build_rollout_dataset(data_cfg: dict, interval: int, split: str = "val"):
    ds_cfg = dict(data_cfg["dataset"])
    return ERA5RollOutDataset(
        interval=interval,
        root=ds_cfg["root"],
        variables=list(ds_cfg["variables"]),
        forcings=list(ds_cfg.get("forcings", []) or []),
        intervals=list(ds_cfg.get("intervals", [6, 12, 24])),
        split=split,
        residual=bool(ds_cfg.get("residual", False)),
    )


# ----------------------------------------------------------------------------
# models + preconds


def build_model(
    model_cfg: dict,
    img_resolution,
    in_channels: int,
    out_channels: int,
    auxiliary_dim: int = 0,
    dtype=jnp.bfloat16,
    mesh=None,
):
    """``mesh``: optional (data, model) Mesh — enables tensor-parallel
    activation sharding constraints on models that support them (SwinV2)."""
    cfg = dict(model_cfg)
    target = _suffix(cfg.pop("_target_", "SwinV2"))
    if target == "SwinV2":
        return SwinV2(
            img_resolution=tuple(img_resolution),
            in_channels=in_channels,
            out_channels=out_channels,
            window_size=tuple(cfg["window_size"]),
            shift_size=tuple(cfg["shift_size"]),
            patch_size=tuple(cfg["patch_size"]),
            depth=int(cfg.get("depth", 6)),
            dim=int(cfg.get("dim", 512)),
            heads=int(cfg.get("heads", 12)),
            head_dim=int(cfg["head_dim"]) if cfg.get("head_dim") else None,
            pos_embed_mode=str(cfg.get("pos_embed_mode", "learned")),
            auxiliary_dim=auxiliary_dim,
            logvar=bool(cfg.get("logvar", False)),
            timestep_weight=float(cfg.get("timestep_weight", 1.0)),
            dtype=dtype,
            mesh=mesh,
            quant=cfg.get("quant") or None,
        )
    if target == "Swin":
        from swift_tpu.models.swin import Swin

        return Swin(
            img_resolution=tuple(img_resolution),
            in_channels=in_channels,
            out_channels=out_channels,
            window_size=tuple(cfg["window_size"]),
            shift_size=tuple(cfg["shift_size"]),
            patch_size=tuple(cfg["patch_size"]),
            depth=int(cfg.get("depth", 4)),
            dim=int(cfg.get("dim", 128)),
            heads=int(cfg.get("heads", 4)),
            head_dim=int(cfg.get("head_dim", cfg.get("dim", 128) // cfg.get("heads", 4))),
            mlp_dim=int(cfg.get("mlp_dim", 4 * cfg.get("dim", 128))),
            auxiliary_dim=auxiliary_dim,
            dtype=dtype,
        )
    if target == "SongUNet":
        from swift_tpu.models.songunet import SongUNet

        return SongUNet(
            img_resolution=tuple(img_resolution),
            in_channels=in_channels,
            out_channels=out_channels,
            auxiliary_dim=auxiliary_dim,
            dtype=dtype,
            **{
                k: v
                for k, v in cfg.items()
                if k in SongUNet.__dataclass_fields__
            },
        )
    if target == "UNet":
        from swift_tpu.models.edm2 import EDM2UNet

        return EDM2UNet(
            img_resolution=tuple(img_resolution),
            in_channels=in_channels,
            out_channels=out_channels,
            auxiliary_dim=auxiliary_dim,
            dtype=dtype,
            **{
                k: v
                for k, v in cfg.items()
                if k in EDM2UNet.__dataclass_fields__
            },
        )
    raise ValueError(f"unknown model target: {target}")


def build_precond(
    precond_cfg: dict,
    model_cfg: dict,
    img_resolution,
    img_channels: int,
    condition_channels: int,
    dtype=jnp.bfloat16,
    sigma_max_override: Optional[float] = None,
    mesh=None,
) -> BasePrecond:
    cfg = dict(precond_cfg)
    target = _suffix(cfg.pop("_target_", "PassPrecond"))
    auxiliary_dim = int(cfg.get("auxiliary_dim", 0))
    model = build_model(
        model_cfg,
        img_resolution,
        img_channels + condition_channels,
        img_channels,
        auxiliary_dim=auxiliary_dim,
        dtype=dtype,
        mesh=mesh,
    )
    common = dict(
        model=model,
        img_resolution=tuple(img_resolution),
        img_channels=img_channels,
        condition_channels=condition_channels,
        auxiliary_dim=auxiliary_dim,
        sigma_min=float(cfg.get("sigma_min", 0.0)),
        sigma_max=(
            sigma_max_override
            if sigma_max_override is not None
            else _infinity(cfg.get("sigma_max", float("inf")))
        ),
        sigma_data=float(cfg.get("sigma_data", 1.0)),
    )
    if target == "EDMPrecond":
        return EDMPrecond(**common)
    if target == "PassPrecond":
        return PassPrecond(**common)
    raise ValueError(f"unknown precond target: {target}")


# ----------------------------------------------------------------------------
# losses


def build_loss(loss_cfg: dict, precond: BasePrecond, dataset) -> Any:
    cfg = dict(loss_cfg)
    target = _suffix(cfg.pop("_target_", ""))
    lat_dim = dataset.img_resolution[0]
    variables = tuple(dataset.variables)
    common = dict(precond=precond, lat_dim=lat_dim, variables=variables)
    if target == "EDMLoss":
        return EDMLoss(
            noise=dict(cfg["noise"]), sigma_data=float(cfg.get("sigma_data", 0.5)),
            **common,
        )
    if target == "TrigFlowLoss":
        return TrigFlowLoss(
            noise=dict(cfg["noise"]), sigma_data=float(cfg.get("sigma_data", 1.0)),
            **common,
        )
    if target == "SCMLoss":
        return SCMLoss(
            noise=dict(cfg["noise"]),
            sigma_data=float(cfg.get("sigma_data", 1.0)),
            tangent_warmup_kimg=int(cfg.get("tangent_warmup_kimg", 0)),
            distillation=bool(cfg.get("distillation", False)),
            **common,
        )
    std = Standardizer.from_dataset(dataset)
    if target == "MSELoss":
        return MSELoss(
            sigma_data=float(cfg.get("sigma_data", 1.0)),
            std_fns=std.loss_std_fns(),
            n_variables=len(variables),
            **common,
        )
    if target == "CRPSLoss":
        return CRPSLoss(
            sigma_data=float(cfg.get("sigma_data", 1.0)),
            ensemble_size=int(cfg.get("ensemble_size", 2)),
            alpha=float(cfg.get("alpha", 1.0)),
            std_fns=std.loss_std_fns(),
            n_variables=len(variables),
            **common,
        )
    raise ValueError(f"unknown loss target: {target}")


# ----------------------------------------------------------------------------
# optimizers (with the reference's SwinV2 param-grouping rules,
# train.py:269-313, and the trainer LR schedule baked in as optax schedules)


def build_optimizer(
    optimizer_cfg: dict,
    trainer_cfg: dict,
    global_batch_size: int,
    params,
    resume_kimg: int = 0,
    mesh=None,
):
    """Returns (optimizer, primary_lr_schedule) — the schedule is what the
    trainer logs as train/lr per tick (reference trainer.py:463)."""
    cfg = dict(optimizer_cfg)
    target = _suffix(cfg.pop("_target_", "Adam"))
    schedules: list = []

    def sched(base_lr):
        fn = lr_schedule(
            float(base_lr),
            global_batch_size,
            lr_rampup_kimg=int(trainer_cfg.get("lr_rampup_kimg", 10000)),
            total_kimg=int(trainer_cfg.get("total_kimg", 200000)),
            lr_min_factor=float(trainer_cfg.get("lr_min_factor", 0.01)),
            lr_cosine_anneal=bool(trainer_cfg.get("lr_cosine_anneal", True)),
            resume_kimg=resume_kimg,
        )
        schedules.append(fn)
        return fn

    if target in ("Adam", "AdamW"):
        wd = float(cfg.get("weight_decay", 0.0))
        betas = cfg.get("betas", (0.9, 0.999))
        opt = optax.adamw(
            learning_rate=sched(cfg.get("lr", 1e-3)),
            b1=float(betas[0]),
            b2=float(betas[1]),
            eps=float(cfg.get("eps", 1e-8)),
            weight_decay=wd,
            mask=adamw_decay_mask(params) if wd else None,
        )
        return opt, schedules[0]
    if target == "MuonWithAuxAdam":
        betas = cfg.get("adam_betas", (0.9, 0.95))
        # Under TP, feature-sharded stacked params take the all_to_all NS
        # path instead of a per-step full momentum replication.
        spec_fn = None
        if mesh is not None and "model" in mesh.axis_names and mesh.shape["model"] > 1:
            from swift_tpu.parallel.sharding import _spec_for

            spec_fn = lambda path, leaf: _spec_for(path, leaf, "model")
        opt = muon_with_aux_adam(
            muon_param_labels,
            lr=sched(cfg.get("lr", 0.02)),
            weight_decay=float(cfg.get("weight_decay", 0.01)),
            adam_lr=sched(cfg.get("adam_lr", 3e-4)),
            adam_betas=(float(betas[0]), float(betas[1])),
            adam_weight_decay=float(cfg.get("adam_weight_decay", 0.01)),
            adam_eps=float(cfg.get("adam_eps", 1e-10)),
            mesh=mesh,
            param_spec_fn=spec_fn,
            # "bfloat16" halves Muon's optimizer state (0.25° memory lever);
            # default None keeps the exact reference trajectory.
            momentum_dtype=(
                jnp.dtype(cfg["momentum_dtype"])
                if cfg.get("momentum_dtype") else None
            ),
        )
        return opt, schedules[0]
    if target == "MARS":
        opt = mars(
            learning_rate=sched(cfg.get("lr", 1e-3)),
            mars_type=cfg.get("mars_type", "mars-adamw"),
            weight_decay=float(cfg.get("weight_decay", 0.0)),
            lr_1d=float(cfg.get("lr_1d", cfg.get("lr", 1e-3))),
        )
        return opt, schedules[0]
    raise ValueError(f"unknown optimizer target: {target}")
