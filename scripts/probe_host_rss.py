"""Isolate the per-step host-RSS growth seen in multi-tick training soaks.

The r3 soak grew ~18 GB/tick (~290 MB/step = one batch) regardless of the
trainer's bounded in-flight window, and the loader alone is flat — so the
growth is in the host->device dispatch/transfer path. This probe runs the
flagship train step on the chip in three modes and prints RSS per step:

  reuse : the SAME host numpy arrays every step (no new host buffers)
  fresh : fresh numpy arrays every step, fully synchronous
          (block_until_ready on the loss each step)
  async : fresh arrays, bounded in-flight window of 4 (the trainer's mode)

If `reuse` grows, the leak is per-call transfer machinery; if only
`fresh`/`async` grow, host buffers are retained past execution completion.

Run on the TPU host: python scripts/probe_host_rss.py [steps_per_mode]
"""

from __future__ import annotations

import gc
import sys
import time
from collections import deque

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = 16


def cur_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576
    return float("nan")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from __graft_entry__ import FLAGSHIP, _build
    from swift_tpu.data.constants import default_variables_69
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    pre = _build(FLAGSHIP)
    loss = SCMLoss(
        precond=pre, lat_dim=128, variables=tuple(default_variables_69()),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=10000,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    optimizer = muon_with_aux_adam(
        muon_param_labels, lr=0.02, adam_lr=3e-4, mesh=mesh
    )

    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype),
        shapes,
    )
    params = jax.device_put(params, jax.devices()[0])
    opt_state = jax.jit(optimizer.init)(params)
    jax.block_until_ready(opt_state)

    @jax.jit
    def step(p, o, key, x, cond, aux):
        def compute(pp):
            return loss(pp, key, x, step=jnp.float32(1e5), condition=cond,
                        auxiliary=aux)

        l, grads = jax.value_and_grad(compute)(p)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return l, p, o

    def fresh_batch():
        return (
            rng.standard_normal((BATCH, 128, 256, 69), dtype=np.float32),
            rng.standard_normal((BATCH, 128, 256, 72), dtype=np.float32),
            np.full((BATCH, 1), 0.6, np.float32),
        )

    b0 = fresh_batch()
    print("compile...", flush=True)
    t0 = time.time()
    l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(1), *b0)
    jax.block_until_ready(l)
    print(f"  {time.time() - t0:.1f}s; baseline rss {cur_rss_gb():.2f} GB",
          flush=True)

    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "reuse", "fresh", "async", "dput",
    ]
    dev = jax.devices()[0]
    for mode in modes:
        gc.collect()
        start = cur_rss_gb()
        inflight: deque = deque()
        t0 = time.time()
        for i in range(n):
            b = b0 if mode == "reuse" else fresh_batch()
            if mode == "dput":
                # explicit placement first: does the implicit-arg transfer
                # path alone retain the payload, or device_put too?
                b = jax.device_put(b, dev)
                jax.block_until_ready(b)
            l, params, opt_state = step(
                params, opt_state, jax.random.PRNGKey(i), *b
            )
            if mode == "async":
                inflight.append(l)
                if len(inflight) > 4:
                    jax.block_until_ready(inflight.popleft())
            else:
                jax.block_until_ready(l)
            if i % 3 == 2:
                print(f"{mode:5s} step {i}: rss {cur_rss_gb():.2f} GB",
                      flush=True)
        jax.block_until_ready(l)
        inflight.clear()
        gc.collect()
        end = cur_rss_gb()
        print(f"{mode:5s}: {start:.2f} -> {end:.2f} GB over {n} steps "
              f"({(end - start) * 1024 / n:.0f} MB/step, "
              f"{(time.time() - t0) / n:.1f} s/step wall)", flush=True)


if __name__ == "__main__":
    main()
