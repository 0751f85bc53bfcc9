"""Config composition tests against the shipped (reference-schema) tree."""

import os

import pytest

from swift_tpu.config import ConfigError, compose, load_config, save_config


def test_compose_default_experiment():
    cfg = compose("train")
    assert cfg["experiment_name"] == "era5-swinv2-1.4-scm"
    # experiment overlays chose the groups
    assert cfg["loss"]["_target_"].endswith("SCMLoss")
    assert cfg["precond"]["_target_"].endswith("PassPrecond")
    # experiment content overrides group defaults
    assert cfg["loss"]["tangent_warmup_kimg"] == 3000
    assert cfg["model"]["dim"] == 1056
    assert cfg["model"]["depth"] == 12
    # `override /loss/noise: loguniform` + experiment's sigma_max
    assert cfg["loss"]["noise"]["dist"] == "loguniform"
    assert cfg["loss"]["noise"]["sigma_max"] == 200
    # `override /optimizer: muon`
    assert cfg["optimizer"]["_target_"].endswith("MuonWithAuxAdam")
    # trainer defaults merged then overridden
    assert cfg["trainer"]["total_kimg"] == 15000
    assert cfg["trainer"]["ema_halflife_kimg"] == 500


def test_compose_select_experiment():
    cfg = compose("train", ["experiment=era5-swinv2-5.6-scm"])
    assert cfg["experiment_name"] == "era5-swinv2-5.6-scm"
    assert cfg["model"]["patch_size"] == [1, 1]
    assert cfg["data"]["batch_size"] == 120
    # 5.6 keeps the default loguniform sigma_max=200 from the noise group
    assert cfg["optimizer"]["_target_"].endswith("AdamW")


def test_value_overrides():
    cfg = compose(
        "train",
        ["trainer.total_kimg=42", "seed=7", "data.batch_size=16",
         "+custom.flag=true"],
    )
    assert cfg["trainer"]["total_kimg"] == 42
    assert cfg["seed"] == 7
    assert cfg["data"]["batch_size"] == 16
    assert cfg["custom"]["flag"] is True


def test_finetune_group():
    cfg = compose("train", ["finetune=multistep"])
    # finetune overlay hard-overrides loss and optimizer
    assert cfg["loss"]["_target_"].endswith("CRPSLoss")
    assert cfg["optimizer"]["_target_"].endswith("AdamW")
    assert cfg["optimizer"]["lr"] == 1e-5
    assert cfg["finetune"]["name"] == "multistep"
    assert cfg["finetune"]["intervals"][0]["steps"] == 1


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("SWIFT_SYNTH_ROOT", "/tmp/xyz")
    cfg = compose("train", ["experiment=synthetic-tiny-scm"])
    assert cfg["data"]["dataset"]["root"] == "/tmp/xyz"
    assert cfg["data"]["dataset"]["variables"][0] == "2m_temperature"


def test_data_defaults_inherited():
    cfg = compose("train")
    # data/defaults.yaml provides residual/split under dataset
    assert cfg["data"]["dataset"]["residual"] is True
    assert cfg["data"]["dataset"]["split"] == "train"
    assert len(cfg["data"]["dataset"]["variables"]) == 69


def test_save_load_roundtrip(tmp_path):
    cfg = compose("train", ["experiment=synthetic-tiny-scm"])
    save_config(cfg, tmp_path / "config.yaml")
    cfg2 = load_config(tmp_path / "config.yaml")
    assert cfg2 == cfg


def test_unknown_config_errors():
    with pytest.raises(ConfigError):
        compose("train", ["experiment=does-not-exist"])


def test_compose_hd128_experiment():
    """The MXU-native head-width flagship variant (bench geometry of record
    for new runs): heads=8 x head_dim=128, otherwise the 1.4-scm flagship."""
    cfg = compose("train", ["experiment=era5-swinv2-1.4-scm-hd128"])
    assert cfg["experiment_name"] == "era5-swinv2-1.4-scm-hd128"
    assert cfg["model"]["heads"] == 8
    assert cfg["model"]["head_dim"] == 128
    assert cfg["model"]["dim"] == 1056
    assert cfg["loss"]["_target_"].endswith("SCMLoss")

    from swift_tpu.factory import build_model

    model = build_model(
        cfg["model"], img_resolution=(8, 16), in_channels=7, out_channels=2,
        auxiliary_dim=1,
    )
    assert model.heads == 8 and model.head_dim == 128


def test_compose_quarter_degree_experiment():
    """0.25° config of record: hd128 geometry + factorized pos embed (the
    single-chip training memory lever, PERF.md) over the flare-0.25 data."""
    cfg = compose("train", ["experiment=era5-swinv2-0.25-scm"])
    assert cfg["experiment_name"] == "era5-swinv2-0.25-scm"
    assert cfg["model"]["heads"] == 8
    assert cfg["model"]["head_dim"] == 128
    assert cfg["model"]["pos_embed_mode"] == "factorized"
    assert "0.25deg" in cfg["data"]["dataset"]["root"]
    assert len(cfg["data"]["dataset"]["variables"]) == 69

    from swift_tpu.factory import build_model

    model = build_model(
        cfg["model"], img_resolution=(8, 16), in_channels=7, out_channels=2,
        auxiliary_dim=1,
    )
    assert model.pos_embed_mode == "factorized"
