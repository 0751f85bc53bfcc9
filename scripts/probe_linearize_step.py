"""A/B the linearize-once sCM step against the production step on the chip.

The production step (PERF.md r4: 2.029 s hd128 B=16) costs ~6x a forward:
jvp primal+tangent (pallas combined kernels), a separate differentiable
forward, and the remat'd backward. ``scm_linearized_value_and_grad`` shares
ONE primal between tangent and gradient (~5x a forward) but must run the
model all-jnp (pallas kernels are either custom_jvp or custom_vjp — never
both, so they can't be linearized AND transposed). This probe prices that
trade at the flagship grid; adopt only if it beats the production step.

Usage: python scripts/probe_linearize_step.py [hd128] [lin|prod|both]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = 16
OUTDIR = "/tmp/swift_probe_linearize"


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
    from swift_tpu.training.linearized import scm_linearized_value_and_grad
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    which = "both"
    for a in sys.argv[1:]:
        if a in ("lin", "prod", "both"):
            which = a

    cfg = dict(FLAGSHIP)
    if "hd128" in sys.argv[1:]:
        cfg.update(heads=8, head_dim=128)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    optimizer = muon_with_aux_adam(
        muon_param_labels, lr=0.02, adam_lr=3e-4, mesh=mesh
    )

    def build(use_pallas):
        c = dict(cfg)
        if not use_pallas:
            c["use_pallas"] = False
        pre = _build(c)
        return pre, SCMLoss(
            precond=pre, lat_dim=128,
            variables=tuple(default_variables_69()),
            noise={"dist": "loguniform", "sigma_min": 0.02,
                   "sigma_max": 200.0},
            tangent_warmup_kimg=10000,
        )

    rng = np.random.default_rng(0)
    pre_p, loss_p = build(use_pallas=True)
    shapes = jax.eval_shape(lambda: pre_p.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype),
        shapes,
    )
    params = jax.device_put(params, jax.devices()[0])
    opt_state = jax.jit(optimizer.init)(params)
    jax.block_until_ready(opt_state)

    x = jnp.asarray(rng.normal(size=(BATCH, 128, 256, 69)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(BATCH, 128, 256, 72)).astype(np.float32))
    aux = jnp.full((BATCH, 1), 0.6, jnp.float32)

    def finish(vg):
        @jax.jit
        def step(p, o, key, x, cond, aux):
            l, grads = vg(p, key, x, cond, aux)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5,
                                         neginf=-1e5),
                grads,
            )
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return l, p, o

        return step

    def time_step(name, step):
        nonlocal params, opt_state
        log(f"[{name}] compile...")
        t0 = time.perf_counter()
        l, params2, opt2 = step(params, opt_state, jax.random.PRNGKey(1),
                                x, cond, aux)
        jax.block_until_ready(l)
        log(f"[{name}]   compile+1st: {time.perf_counter() - t0:.1f}s "
            f"loss={float(l):.4f}")
        # sync + drop outputs every iteration: async dispatch would hold N
        # copies of (params, opt_state) outputs at once, which OOMs the
        # linearized step's larger working set (r5). Per-step sync overhead
        # is ~ms against a ~2 s step.
        del params2, opt2
        t0 = time.perf_counter()
        N = 3
        for i in range(N):
            l, p2, o2 = step(params, opt_state,
                             jax.random.PRNGKey(i), x, cond, aux)
            jax.block_until_ready(l)
            del p2, o2
        per = (time.perf_counter() - t0) / N
        log(f"[{name}] wall/step at B={BATCH}: {per:.3f} s")
        return per

    if which in ("prod", "both"):
        def prod_vg(p, key, x, cond, aux):
            def compute(pp):
                return loss_p(pp, key, x, step=jnp.float32(1e5),
                              condition=cond, auxiliary=aux)
            return jax.value_and_grad(compute)(p)

        time_step("prod-pallas", finish(prod_vg))

    if which in ("lin", "both"):
        pre_j, loss_j = build(use_pallas=False)
        lin = scm_linearized_value_and_grad(loss_j)

        def lin_vg(p, key, x, cond, aux):
            return lin(p, key, x, jnp.float32(1e5), cond, aux)

        step = finish(lin_vg)
        time_step("linearized-jnp", step)

        from scripts._trace import device_op_totals, start_device_trace

        start_device_trace(OUTDIR)
        l, _, _ = step(params, opt_state, jax.random.PRNGKey(9), x, cond,
                       aux)
        jax.block_until_ready(l)
        jax.profiler.stop_trace()
        agg, cnt = device_op_totals(OUTDIR)
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ms:9.2f} ms/step  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
