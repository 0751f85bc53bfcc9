"""Config interchangeability: our composer reads the REFERENCE's own Hydra
config tree (BASELINE.md requires config interchange)."""

import os

import pytest

from swift_tpu.config import compose

REF_CONFIGS = "/root/reference/src/swift/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference tree not mounted"
)


def test_compose_reference_flagship():
    cfg = compose("train", config_dir=REF_CONFIGS)
    assert cfg["experiment_name"] == "era5-swinv2-1.4-scm"
    assert cfg["model"]["_target_"] == "swift.models.swinv2.SwinV2"
    assert cfg["model"]["dim"] == 1056 and cfg["model"]["depth"] == 12
    assert cfg["model"]["window_size"] == [16, 16]
    assert cfg["loss"]["_target_"] == "swift.training.loss.SCMLoss"
    assert cfg["loss"]["tangent_warmup_kimg"] == 3000
    assert cfg["loss"]["noise"]["dist"] == "loguniform"
    assert cfg["loss"]["noise"]["sigma_max"] == 200
    assert cfg["optimizer"]["_target_"].endswith("MuonWithAuxAdam")
    assert cfg["trainer"]["total_kimg"] == 15000
    assert len(cfg["data"]["dataset"]["variables"]) == 69
    assert cfg["data"]["dataset"]["residual"] is True


def test_compose_reference_experiment_selection():
    cfg = compose(
        "train",
        ["experiment=era5-swinv2-5.6-scm"],
        config_dir=REF_CONFIGS,
    )
    assert cfg["model"]["patch_size"] == [1, 1]
    assert cfg["data"]["batch_size"] == 120
    assert cfg["optimizer"]["_target_"] == "torch.optim.AdamW"


def test_compose_reference_finetune_overlay():
    cfg = compose("train", ["finetune=multistep"], config_dir=REF_CONFIGS)
    # the reference finetune yaml has NO @package directive: its literal
    # content lands under cfg["finetune"] (hydra semantics) while its
    # defaults select the loss/optimizer groups globally.
    assert cfg["loss"]["_target_"].endswith("CRPSLoss")
    assert cfg["optimizer"]["_target_"] == "torch.optim.AdamW"
    assert cfg["finetune"]["finetune"]["name"] == "multistep"
    assert cfg["finetune"]["optimizer"]["lr"] == 1e-5


def test_reference_model_configs_buildable():
    """Every reference model target resolves in our factory (shape-level)."""
    from swift_tpu import factory

    cfg = compose("train", config_dir=REF_CONFIGS)
    model = factory.build_model(
        cfg["model"], (128, 256), 69 * 2 + 3, 69, auxiliary_dim=1
    )
    assert model.dim == 1056

    cfg_unet = compose(
        "train", ["experiment=era5-unet-5.6"], config_dir=REF_CONFIGS
    )
    m2 = factory.build_model(
        cfg_unet["model"], (32, 64), 69 * 2 + 3, 69, auxiliary_dim=1
    )
    assert m2.__class__.__name__ in ("SongUNet", "EDM2UNet")
