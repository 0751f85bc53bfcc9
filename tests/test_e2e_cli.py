"""End-to-end CLI flows on synthetic data (the framework's integration
tests): pretrain -> generate -> evaluate, resume, multistep finetune,
distillation. Each runs the real entry points in-process on a tiny model.
"""

import json
import os

import numpy as np
import pytest

from swift_tpu.data.synthetic import make_synthetic_era5

VARS = [
    "2m_temperature", "sea_surface_temperature",
    "geopotential_500", "temperature_850",
]
FORCINGS = ["land_sea_mask"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_synthetic_era5(str(root / "data"), VARS, FORCINGS,
                        n_train=24, n_val=12, n_test=12, shape=(8, 16))
    return root


def _train(workdir, run_id, *overrides):
    import swift_tpu.train as train_cli

    os.environ["SWIFT_SYNTH_ROOT"] = str(workdir / "data")
    os.environ["RUN_ID"] = run_id
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        rc = train_cli.main([
            "experiment=synthetic-tiny-scm",
            "trainer.total_kimg=1",
            "data.batch_size=8",
            *overrides,
        ])
    finally:
        os.chdir(cwd)
        os.environ.pop("RUN_ID", None)
    assert rc == 0 or rc is None
    return workdir / "results" / "synthetic-tiny-scm" / run_id


def test_pretrain_generate_evaluate(workdir):
    run = _train(workdir, "t0")
    assert (run / "checkpoints" / "checkpoint-000001.npz").exists()
    assert (run / "stats.jsonl").exists()

    import swift_tpu.generate as gen_cli

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        ofile = gen_cli.main(gen_cli.parser.parse_args([
            "--input", str(run), "--members", "2", "--steps", "2",
            "--batch", "2", "--samples", "2", "--interval", "6",
            "--output", str(run / "output" / "fp"),
        ]))
    finally:
        os.chdir(cwd)
    assert os.path.exists(ofile)
    assert os.path.dirname(ofile) == str(run / "output" / "fp")

    from swift_tpu.data.era5 import ERA5Dataset
    from swift_tpu.data.h52zarr import build_truth_zarr
    from swift_tpu.eval.metrics import evaluate

    ds = ERA5Dataset(root=str(workdir / "data"), variables=VARS, split="test")
    truth = build_truth_zarr(ds, str(workdir / "truth.zarr"), workers=2)
    metrics = evaluate(truth, ofile)
    assert metrics, "no metrics computed"
    assert all(np.isfinite(v) for v in metrics.values())


def test_resume_continues(workdir):
    run0 = _train(workdir, "r0")
    run1 = _train(workdir, "r1", "resume=r0", "trainer.total_kimg=2")
    ck = run1 / "checkpoints" / "checkpoint-000002.npz"
    assert ck.exists(), os.listdir(run1 / "checkpoints")

    # in-place resume (RUN_ID == resume id): a cut run continues in the
    # same directory instead of restarting (used by scripts/ab_int8.py).
    run1b = _train(workdir, "r1", "resume=r1", "trainer.total_kimg=3")
    assert run1b == run1
    ck3 = run1 / "checkpoints" / "checkpoint-000003.npz"
    assert ck3.exists(), os.listdir(run1 / "checkpoints")


def test_multistep_finetune(workdir):
    _train(workdir, "f0")
    run = _train(
        workdir, "f1", "finetune=multistep", "resume=f0",
        "finetune.intervals=[{steps: 1, kimg: 1}]",
    )
    assert any(
        p.startswith("checkpoint-") for p in os.listdir(run / "checkpoints")
    )
    # finetune swapped the loss to CRPS in the saved config
    import yaml

    cfg = yaml.safe_load((run / ".hydra" / "config.yaml").read_text())
    assert cfg["loss"]["_target_"].endswith("CRPSLoss")


def test_distillation(workdir):
    teacher = _train(workdir, "d_teacher", "loss=trigflow")
    student = _train(
        workdir, "d_student",
        f"distill={teacher}",
    )
    assert (student / "checkpoints" / "checkpoint-000001.npz").exists()
