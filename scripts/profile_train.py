"""Profile the flagship sCM train step on the chip and aggregate op times.

Same trace-aggregation approach as profile_forward.py, over the full step
(primal fwd + jvp fwd + remat'd bwd + Muon + EMA) at a realistic batch.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = 16
OUTDIR = "/tmp/swift_profile_train"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
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

    cfg = dict(FLAGSHIP)
    if "hd128" in sys.argv[1:]:
        # the MXU-native head-width variant (era5-swinv2-1.4-scm-hd128.yaml)
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
        grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
            grads,
        )
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return l, p, o

    x = jnp.asarray(rng.normal(size=(BATCH, 128, 256, 69)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(BATCH, 128, 256, 72)).astype(np.float32))
    aux = jnp.full((BATCH, 1), 0.6, jnp.float32)

    log("compile...")
    t0 = time.perf_counter()
    l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(1), x,
                                cond, aux)
    jax.block_until_ready(l)
    log(f"  {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    N = 3
    for i in range(N):
        l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(i),
                                    x, cond, aux)
    jax.block_until_ready(l)
    per = (time.perf_counter() - t0) / N
    log(f"train step at B={BATCH}: {per:.3f} s")

    from scripts._trace import start_device_trace

    start_device_trace(OUTDIR)
    for i in range(2):
        l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(i),
                                    x, cond, aux)
    jax.block_until_ready(l)
    jax.profiler.stop_trace()

    from scripts._trace import device_op_totals

    agg, cnt = device_op_totals(OUTDIR)
    if not agg:
        return
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms / 2:9.2f} ms/step  x{cnt[name] // 2:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
