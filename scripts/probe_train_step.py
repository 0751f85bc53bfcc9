"""Device-side flagship sCM train-step rate (batch on device, no input
pipeline): the training-throughput number the tunnel-fed bench_train.py
cannot measure (its dt/data is ~60x dt/step through the dev relay).

Usage: python scripts/probe_train_step.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from __graft_entry__ import FLAGSHIP, _build
from swift_tpu.data.constants import default_variables_69
from swift_tpu.training.loss import SCMLoss
from swift_tpu.training.optimizers import muon_with_aux_adam
from swift_tpu.training.trainer import muon_param_labels


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = dict(FLAGSHIP)
    if "hd128" in sys.argv[2:]:
        # the MXU-native head-width variant (experiment
        # era5-swinv2-1.4-scm-hd128.yaml): 8 x 128 heads, zero qkv pad tax
        cfg.update(heads=8, head_dim=128)
    pre = _build(cfg)
    loss = SCMLoss(
        precond=pre, lat_dim=128, variables=tuple(default_variables_69()),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=10000,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    optimizer = muon_with_aux_adam(
        muon_param_labels, lr=0.02, adam_lr=3e-4, mesh=mesh
    )

    print("init params...", flush=True)
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
    def step(p, o, key, x, cond, aux, nimg):
        def compute(pp):
            return loss(pp, key, x, step=nimg, condition=cond, auxiliary=aux)

        l, grads = jax.value_and_grad(compute)(p)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
            grads,
        )
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return l, p, o

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 128, 256, 69)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, 128, 256, 72)).astype(np.float32))
    aux = jnp.full((B, 1), 0.6, jnp.float32)

    print("compile...", flush=True)
    t0 = time.time()
    l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(1), x,
                                cond, aux, jnp.float32(1e5))
    jax.block_until_ready(l)
    print(f"  compile+first step {time.time() - t0:.1f}s, loss {float(l):.4f}",
          flush=True)

    N = 8
    t0 = time.time()
    for i in range(N):
        l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(i),
                                    x, cond, aux, jnp.float32(1e5))
    jax.block_until_ready(l)
    dt = (time.time() - t0) / N
    # analytic flops: sCM = fwd + jvp-fwd + bwd(2x fwd) ~ 4x fwd
    fwd_tf = 2.72e12 * B
    print(
        f"sCM train step @ batch {B}: {dt:.3f} s/step = {B / dt:.1f} img/s/chip"
        f" (~{4 * fwd_tf / dt / 1e12:.0f} TF/s incl. remat recompute)",
        flush=True,
    )


if __name__ == "__main__":
    main()
