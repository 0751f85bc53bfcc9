"""Bisect client-side lowering cost of the sCM train-loss grad on axon.

Usage: python scripts/probe_lower.py <remat:0|1> <pallas:0|1> [batch]
Prints lowering wall time + peak RSS. Used to localize the remat x pallas
lowering blowup (bench_train r2).
"""

import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
import jax.numpy as jnp

from __graft_entry__ import FLAGSHIP, _build
from swift_tpu.data.constants import default_variables_69
from swift_tpu.training.loss import SCMLoss


def main():
    remat = bool(int(sys.argv[1]))
    pallas = bool(int(sys.argv[2]))
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    pre = _build(FLAGSHIP)
    model = pre.model.clone(remat_layers=remat, use_pallas=pallas)
    pre = type(pre)(
        model=model, img_resolution=pre.img_resolution,
        img_channels=pre.img_channels,
        condition_channels=pre.condition_channels,
        auxiliary_dim=pre.auxiliary_dim, sigma_data=pre.sigma_data,
    )
    loss = SCMLoss(
        precond=pre, lat_dim=128, variables=tuple(default_variables_69()),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    x = jax.ShapeDtypeStruct((B, 128, 256, 69), jnp.float32)
    cond = jax.ShapeDtypeStruct((B, 128, 256, 72), jnp.float32)
    aux = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    params = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))

    full = len(sys.argv) > 4 and sys.argv[4] == "step"
    if full:
        # the real trainer step: grad + nan_to_num + Muon + EMA
        import numpy as np
        import optax
        from jax.sharding import Mesh

        from swift_tpu.training.optimizers import muon_with_aux_adam
        from swift_tpu.training.trainer import muon_param_labels

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    ("data", "model"))
        optimizer = muon_with_aux_adam(
            muon_param_labels, lr=0.02, adam_lr=3e-4, mesh=mesh
        )
        opt_state = jax.eval_shape(lambda p: optimizer.init(p), params)

        def f(p, o, k, xx, cc, aa):
            def compute(pp):
                return loss(pp, k, xx, jnp.float32(100.0), condition=cc,
                            auxiliary=aa)

            l, grads = jax.value_and_grad(compute)(p)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5,
                                         neginf=-1e5), grads)
            updates, o = optimizer.update(grads, o, p)
            p2 = optax.apply_updates(p, updates)
            ema = jax.tree_util.tree_map(lambda e, q: q + 0.99 * (e - q),
                                         p, p2)
            return l, p2, ema, o

        t0 = time.time()
        lowered = jax.jit(f).lower(params, opt_state, key, x, cond, aux)
    else:
        def f(p, k, xx, cc, aa):
            return jax.value_and_grad(loss)(
                p, k, xx, jnp.float32(100.0), condition=cc, auxiliary=aa
            )

        t0 = time.time()
        lowered = jax.jit(f).lower(params, key, x, cond, aux)
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"remat={remat} pallas={pallas} B={B} full={full}: lower {dt:.1f}s, "
          f"rss {rss:.1f} GB, hlo {len(lowered.as_text())/1e6:.1f} MB",
          flush=True)


if __name__ == "__main__":
    main()
