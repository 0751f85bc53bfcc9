"""Worker process for tests/test_multiprocess.py — one rank of a 2-process
x 4-device CPU "pod" (or a single-process 8-device reference run).

Exercises the real multi-process runtime tier (the code that runs on an
actual pod slice, reference scripts/aurora-general.sh:58-96):
  * ``maybe_initialize_distributed`` with the explicit-coordinator env
    contract (SWIFT_COORDINATOR / SWIFT_NUM_PROCESSES / SWIFT_PROCESS_ID);
  * a global 8-device ``data`` mesh spanning both processes;
  * one real DP sCM train step where each rank passes only its LOCAL rows
    to ``shard_batch`` (the train.py loader contract: rank round-robin
    sampler, ``global_batch // process_count`` rows per rank) and the
    global batch is assembled via make_array_from_process_local_data —
    verified row-for-row against the known global batch;
  * the process-0 store creation + ``sync_global_devices`` barrier from
    ``swift_tpu.generate`` (reference generate.py:241-252).

Usage: _mp_worker.py <rank|single> <out_dir>  (coordinator env set by the
test; "single" runs the same step on a 1-process 8-device mesh with the
full global batch, so the test can assert the 2-process loss matches).
Prints "MP_OK loss=<float>" on success.
"""

import os
import sys

mode = sys.argv[1]
out_dir = sys.argv[2]
single = mode == "single"
rank = 0 if single else int(mode)

import jax

jax.config.update("jax_platforms", "cpu")  # ambient env points jax at the TPU

from swift_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, maybe_initialize_distributed, replicate, shard_batch,
)

if not single:
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
    run_dir=os.path.join(out_dir, f"rank{mode}"), checkpoint_ticks=None,
    val_ticks=None,
)

# The GLOBAL batch (both ranks construct the same arrays from one seed so
# the worker can verify assembly); each rank passes ONLY ITS LOCAL ROWS to
# shard_batch — the train.py loader contract (rank round-robin sampler,
# global_batch // process_count rows per rank).
B = 8
rng = np.random.default_rng(0)
global_batch = {
    "x": rng.normal(size=(B, H, W, C + F)).astype(np.float32),
    "t": rng.normal(size=(B, H, W, C)).astype(np.float32),
    "idx": np.arange(B, dtype=np.int32),
    "delta": np.full((B, 1), 0.6, np.float32),
}
if single:
    local = global_batch
else:
    lb = B // jax.process_count()
    local = {k: v[rank * lb:(rank + 1) * lb] for k, v in global_batch.items()}
batch = shard_batch(local, mesh)

# row-for-row: the assembled global array's leading dim is the FULL batch
# and every addressable shard holds exactly the global rows at its index.
for key in ("x", "t", "idx", "delta"):
    arr = batch[key]
    assert arr.shape[0] == B, (key, arr.shape)
    for s in arr.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), global_batch[key][s.index])

state = trainer.state
state = type(state)(
    replicate(state.params, mesh), replicate(state.ema, mesh),
    replicate(state.opt_state, mesh), state.nimg,
)
step = trainer._get_step(1, None)
new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
loss = float(metrics["loss"])  # fully-replicated output: addressable
assert np.isfinite(loss), loss

if single:
    print(f"MP_OK loss={loss!r}", flush=True)
    sys.exit(0)

# Process-0 store creation behind the global barrier (generate.py).
from swift_tpu.generate import _rank0_barrier  # noqa: E402

marker = os.path.join(out_dir, "store_marker")


def _create():
    with open(marker, "w") as f:
        f.write("created-by-rank0")


_rank0_barrier(_create)
assert os.path.exists(marker), "store missing after rank-0 barrier"

print(f"MP_OK loss={loss!r}", flush=True)
