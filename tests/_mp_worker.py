"""Worker process for tests/test_multiprocess.py — one rank of a 2-process
x 4-device CPU "pod".

Exercises the real multi-process runtime tier (the code that runs on an
actual pod slice, reference scripts/aurora-general.sh:58-96):
  * ``maybe_initialize_distributed`` with the explicit-coordinator env
    contract (SWIFT_COORDINATOR / SWIFT_NUM_PROCESSES / SWIFT_PROCESS_ID);
  * a global 8-device ``data`` mesh spanning both processes;
  * one real DP sCM train step (Trainer._get_step) on globally-sharded
    batch arrays (``shard_batch``) with replicated state (``replicate``);
  * the process-0 store creation + ``sync_global_devices`` barrier from
    ``swift_tpu.generate`` (reference generate.py:241-252).

Usage: _mp_worker.py <rank> <out_dir>   (coordinator env set by the test)
Prints "MP_OK loss=<float>" on success; the test asserts it on both ranks.
"""

import os
import sys

rank = int(sys.argv[1])
out_dir = sys.argv[2]

import jax

jax.config.update("jax_platforms", "cpu")  # ambient env points jax at the TPU

from swift_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, maybe_initialize_distributed, replicate, shard_batch,
)

assert maybe_initialize_distributed(), "explicit-coordinator bootstrap failed"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank, (jax.process_index(), rank)
assert jax.local_device_count() == 4 and jax.device_count() == 8

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from swift_tpu.models.precond import PassPrecond  # noqa: E402
from swift_tpu.models.swinv2 import SwinV2  # noqa: E402
from swift_tpu.training.loss import SCMLoss  # noqa: E402
from swift_tpu.training.optimizers import muon_with_aux_adam  # noqa: E402
from swift_tpu.training.trainer import Trainer, muon_param_labels  # noqa: E402

mesh = make_mesh(("data",))
assert mesh.devices.size == 8

H, W, C, F = 8, 16, 3, 1
model = SwinV2(
    img_resolution=(H, W), in_channels=2 * C + F, out_channels=C,
    window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
    depth=2, dim=32, heads=4, auxiliary_dim=1, logvar=True,
    dtype=jnp.float32,
)
precond = PassPrecond(
    model=model, img_resolution=(H, W), img_channels=C,
    condition_channels=C + F, auxiliary_dim=1, sigma_data=1.0,
)
loss_fn = SCMLoss(
    precond=precond, lat_dim=H,
    variables=("2m_temperature", "geopotential_500", "temperature_850"),
    noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    tangent_warmup_kimg=1,
)
optimizer = muon_with_aux_adam(muon_param_labels, lr=0.02, adam_lr=3e-4)
trainer = Trainer(
    precond, optimizer, loss_fn, global_batch_size=8, total_kimg=1,
    run_dir=os.path.join(out_dir, f"rank{rank}"), checkpoint_ticks=None,
    val_ticks=None,
)

# Every process holds the same GLOBAL batch (identically-seeded sampler —
# the mesh analogue of the reference's rank offsets); shard_batch
# materializes only locally-owned rows.
B = 8
rng = np.random.default_rng(0)
batch = shard_batch(
    {
        "x": rng.normal(size=(B, H, W, C + F)).astype(np.float32),
        "t": rng.normal(size=(B, H, W, C)).astype(np.float32),
        "idx": np.arange(B, dtype=np.int32),
        "delta": np.full((B, 1), 0.6, np.float32),
    },
    mesh,
)
state = trainer.state
state = type(state)(
    replicate(state.params, mesh), replicate(state.ema, mesh),
    replicate(state.opt_state, mesh), state.nimg,
)
step = trainer._get_step(1, None)
new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["loss"])  # fully-replicated output: addressable
assert np.isfinite(loss), loss

# Process-0 store creation behind the global barrier (generate.py).
from swift_tpu.generate import _rank0_barrier  # noqa: E402

marker = os.path.join(out_dir, "store_marker")


def _create():
    with open(marker, "w") as f:
        f.write("created-by-rank0")


_rank0_barrier(_create)
assert os.path.exists(marker), "store missing after rank-0 barrier"

print(f"MP_OK loss={loss:.6f}", flush=True)
