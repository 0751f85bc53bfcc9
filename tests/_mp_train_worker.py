"""One rank of the 2-process ``swift_tpu.train`` CLI test
(tests/test_multiprocess.py::test_two_process_train_cli).

Runs the REAL training entry point — config composition, rank round-robin
``InfiniteSampler`` (rank=process_index), per-rank local ``BatchLoader``
(global_batch // process_count rows), ``ShardedLoader`` -> ``shard_batch``
local-row assembly, Trainer loop, rank-0 checkpointing — on synthetic data
under a 2-process x 4-device CPU "pod". The reference exercises the same
tier via MPI + DDP (scripts/aurora-general.sh:58-96, train.py:137).

Usage: _mp_train_worker.py <rank> <workdir>  (coordinator env set by test)
"""

import os
import sys

rank = int(sys.argv[1])
workdir = sys.argv[2]

import jax

jax.config.update("jax_platforms", "cpu")  # ambient env points jax at the TPU

import numpy as np  # noqa: E402

VARS = [
    "2m_temperature", "sea_surface_temperature",
    "geopotential_500", "temperature_850",
]
FORCINGS = ["land_sea_mask"]

data_root = os.path.join(workdir, "data")
if rank == 0:
    from swift_tpu.data.synthetic import make_synthetic_era5

    make_synthetic_era5(data_root, VARS, FORCINGS,
                        n_train=24, n_val=12, n_test=12, shape=(8, 16))
    with open(os.path.join(workdir, ".data_ready"), "w") as f:
        f.write("ok")
else:
    import time

    for _ in range(600):
        if os.path.exists(os.path.join(workdir, ".data_ready")):
            break
        time.sleep(0.5)
    else:
        raise TimeoutError("rank 0 never built the synthetic dataset")

os.environ["SWIFT_SYNTH_ROOT"] = data_root
os.environ["RUN_ID"] = "mp2"
os.chdir(workdir)

import swift_tpu.train as train_cli  # noqa: E402

rc = train_cli.main([
    "experiment=synthetic-tiny-scm",
    "trainer.total_kimg=1",
    "trainer.val_ticks=null",
    "data.batch_size=8",
    "data.data_workers=2",
])
assert rc == 0 or rc is None, rc
assert jax.process_count() == 2

print("MP_TRAIN_OK", flush=True)
