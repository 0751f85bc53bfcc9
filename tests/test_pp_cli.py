"""Pipeline-parallel prediction through the PRODUCT surface (r3 VERDICT
missing #4): ``swift-generate --pp 2`` must produce the same forecast store
as the plain data-sharded run, end to end (config + checkpoint + CLI + zarr).

The reference intended exactly this and never shipped it — the dead
``pipeline_engine`` kwarg and "## TODO: PP Prediction" stubs in
reference src/swift/generating/diffusion.py:25,65-71.
"""

import jax
import numpy as np
import pytest
import yaml

from swift_tpu.data.era5 import ERA5Dataset
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.utils import zarr_lite
from swift_tpu.utils.checkpoint import save_checkpoint

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]
SHAPE = (8, 16)

CFG = """
experiment_name: pp-test
seed: 0
data:
  batch_size: 4
  dataset:
    _target_: swift.data.era5.ERA5Dataset
    root: {root}
    variables: {vars}
    forcings: {forcings}
    residual: true
    intervals: [6]
model:
  _target_: swift_tpu.models.swinv2.SwinV2
  window_size: [2, 2]
  shift_size: [1, 1]
  patch_size: [2, 2]
  depth: 4
  dim: 32
  heads: 4
precond:
  _target_: swift_tpu.models.precond.PassPrecond
  auxiliary_dim: 1
  sigma_data: 1.0
solver:
  type: scm
  num_steps: 1
"""


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Minimal run dir: synthetic data + config + random-init checkpoint
    (depth 4 = 2 block pairs, splittable over 2 pipeline stages)."""
    import swift_tpu.factory as factory

    ds_root = tmp_path_factory.mktemp("era5pp")
    make_synthetic_era5(str(ds_root), VARS, FORCINGS, n_train=8, n_val=8,
                       n_test=8, shape=SHAPE)
    cfg = CFG.format(root=ds_root, vars=VARS, forcings=FORCINGS)
    run = tmp_path_factory.mktemp("pprun")
    (run / ".hydra").mkdir()
    (run / "checkpoints").mkdir()
    (run / ".hydra" / "config.yaml").write_text(cfg)

    cfg_d = yaml.safe_load(cfg)
    ds = ERA5Dataset(root=str(ds_root), variables=VARS, forcings=FORCINGS,
                     residual=True, split="test")
    precond = factory.build_precond(
        cfg_d["precond"], cfg_d["model"], ds.img_resolution,
        ds.n_target_channels, ds.n_condition_channels,
    )
    params = precond.init(jax.random.PRNGKey(0))
    # zero-init head/modulation would make the store all-zero residuals;
    # refill so PP actually has signal to get wrong
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        0.05 * jax.random.normal(jax.random.PRNGKey(1000 + i), a.shape, a.dtype)
        if not np.any(np.asarray(a)) else a
        for i, a in enumerate(leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    save_checkpoint(
        str(run / "checkpoints" / "checkpoint-000001.npz"),
        {"params": params, "ema": params},
    )
    return run


def _run_cli(run, extra):
    import swift_tpu.generate as gen_cli

    args = gen_cli.parser.parse_args([
        "--input", str(run), "--members", "4", "--steps", "2",
        "--batch", "2", "--samples", "2", "--interval", "6",
    ] + extra)
    ofile = gen_cli.main(args)
    g = zarr_lite.open_group(ofile)
    return {
        var: np.array(g[var][:])
        for var in ("2m_temperature", "geopotential", "temperature")
    }


def test_generate_cli_pp_matches_data_sharded(run_dir):
    assert len(jax.devices()) == 8
    base = _run_cli(run_dir, [])                    # (data=8,)
    pp = _run_cli(run_dir, ["--pp", "2"])           # (data=4, pipe=2)
    for var, b in base.items():
        p = pp[var]
        assert np.isfinite(p).all()
        assert np.abs(b).max() > 1e-6, "store is all zeros - test is vacuous"
        np.testing.assert_allclose(p, b, rtol=2e-2, atol=2e-2,
                                   err_msg=f"PP store mismatch for {var}")


def test_generate_cli_pp_from_system_config(run_dir):
    """A run saved with system/tpu-pp.yaml engages PP with no CLI flag."""
    import swift_tpu.generate as gen_cli
    from swift_tpu.parallel import mesh as meshlib

    cfg_path = run_dir / ".hydra" / "config.yaml"
    orig = cfg_path.read_text()
    try:
        cfg_path.write_text(orig + (
            "system:\n  mesh:\n    axes: [data, pipe]\n    sizes: [-1, 2]\n"
            "  pipeline:\n    n_micro: 2\n"
        ))
        base = _run_cli(run_dir, ["--pp", "1"])  # explicit override: PP off
        made = {}
        real_make_mesh = meshlib.make_mesh

        def spy(axes, sizes=None):
            made["axes"] = tuple(axes)
            return real_make_mesh(axes, sizes)

        gen_cli.make_mesh, saved = spy, gen_cli.make_mesh
        try:
            auto = _run_cli(run_dir, [])  # picks pipe axis up from config
        finally:
            gen_cli.make_mesh = saved
        assert made["axes"] == ("data", "pipe")
        for var, b in base.items():
            np.testing.assert_allclose(auto[var], b, rtol=2e-2, atol=2e-2)
    finally:
        cfg_path.write_text(orig)
