"""Device-side CRPS multistep FINETUNE step rate on the real chip.

The product recipe (reference finetune/multistep.yaml + trainer.py:352-376)
pretrains with sCM then finetunes with the almost-fair kernel CRPS loss on
autoregressive unrolls. The sCM pretrain step is measured in PERF.md
(probe_train_step.py); this probe measures the finetune side: flagship
SwinV2 at 1.4°, CRPSLoss (ensemble_size=2) unrolled `steps` forecast steps
with jax.checkpoint per step, AdamW(1e-5) like the finetune config.

Per step the loss runs ensemble_size × steps model forwards; the backward
re-runs the checkpointed unroll. Analytic FLOPs ≈ (2·steps fwd) + backward
(2× of that) = 6·steps × fwd per sample.

Usage: python scripts/probe_finetune_step.py [batch] [steps] [hd128|parity]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import FLAGSHIP, _build
from swift_tpu.data.constants import default_variables_69
from swift_tpu.data.standardize import Standardizer
from swift_tpu.training.loss import CRPSLoss

OUTDIR = "/tmp/swift_probe_finetune"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    geometry = sys.argv[3] if len(sys.argv) > 3 else "hd128"
    H, W, C, F = 128, 256, 69, 3

    cfg = dict(FLAGSHIP)
    if geometry == "hd128":
        cfg.update(heads=8, head_dim=128)
    pre = _build(cfg)

    ones = np.ones((1, 1, C + F), np.float32)
    std = Standardizer(
        x_mean=jnp.asarray(0.1 * ones),
        x_std=jnp.asarray(1.1 * ones),
        t_mean={6: jnp.asarray(0.05 * ones[..., :C])},
        t_std={6: jnp.asarray(0.9 * ones[..., :C])},
        n_variables=C,
        n_forcings=F,
        sst_index=None,
    )
    loss = CRPSLoss(
        precond=pre, lat_dim=H, variables=tuple(default_variables_69()),
        sigma_data=1.0, ensemble_size=2, alpha=0.95,
        std_fns=std.loss_std_fns(), n_variables=C,
    )
    optimizer = optax.adamw(1e-5)

    print(f"geometry={geometry} batch={B} steps={steps}", flush=True)
    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype), shapes
    )
    params = jax.device_put(params, jax.devices()[0])
    opt_state = jax.jit(optimizer.init)(params)
    jax.block_until_ready(opt_state)

    @jax.jit
    def step(p, o, key, x, cond, aux, forcings_seq):
        def compute(pp):
            return loss(pp, key, x, condition=cond, auxiliary=aux,
                        forcings_seq=forcings_seq, delta=6, steps=steps)

        l, grads = jax.value_and_grad(compute)(p)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
            grads,
        )
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return l, p, o

    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, H, W, C + F)).astype(np.float32))
    fseq = jnp.asarray(
        rng.normal(size=(B, steps, H, W, F)).astype(np.float32)
    )
    aux = jnp.full((B, 1), 0.6, jnp.float32)

    print("compile...", flush=True)
    t0 = time.perf_counter()
    l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(1), x,
                                cond, aux, fseq)
    jax.block_until_ready(l)
    print(f"  {time.perf_counter() - t0:.1f}s; loss {float(l):.4f}", flush=True)
    assert np.isfinite(float(l))

    shutil.rmtree(OUTDIR, ignore_errors=True)
    jax.profiler.start_trace(OUTDIR)
    N = 4
    for i in range(N):
        l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(i),
                                    x, cond, aux, fseq)
    jax.block_until_ready(l)
    jax.profiler.stop_trace()

    from scripts._trace import device_ms

    dt = device_ms(OUTDIR, "jit_step", N) / 1e3
    fwd_tf = 2.72 * B
    tf = 6 * steps * fwd_tf  # 2 members × steps fwd, bwd ≈ 2× fwd
    print(
        f"CRPS finetune step @ B={B}, steps={steps}: {dt:.3f} s device = "
        f"{B / dt:.1f} img/s/chip, {tf / dt:.0f} TF/s "
        f"({tf / dt / 197 * 100:.0f}% MFU by the 6·steps·fwd model)",
        flush=True,
    )


if __name__ == "__main__":
    main()
