"""Dump the compiled train-step HLO and print the named fusions' bodies.

Companion to profile_train.py: the trace shows op names (fusion.NNNN); this
maps them back to what they compute. Usage:
    python scripts/probe_step_hlo.py [hd128] [names...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import FLAGSHIP, _build
    from swift_tpu.data.constants import default_variables_69
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels
    from jax.sharding import Mesh

    args = sys.argv[1:]
    cfg = dict(FLAGSHIP)
    if "hd128" in args:
        cfg.update(heads=8, head_dim=128)
    names = [a for a in args if a not in ("hd128",)]
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

    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes
    )
    opt_state = jax.eval_shape(optimizer.init, params)

    B = 16

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
        pn = optax.apply_updates(p, updates)
        return l, pn, o

    xs = jax.ShapeDtypeStruct((B, 128, 256, 69), jnp.float32)
    cs = jax.ShapeDtypeStruct((B, 128, 256, 72), jnp.float32)
    asx = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    ks = jax.ShapeDtypeStruct((2,), jnp.uint32)
    txt = (
        jax.jit(step)
        .lower(params, opt_state, ks, xs, cs, asx)
        .compile()
        .as_text()
    )
    print(f"HLO: {len(txt.splitlines())} lines", file=sys.stderr)
    if not names:
        # print every fusion computation's root + a one-line summary
        for m in re.finditer(r"^  (fusion(?:\.\d+)?) = ([^\n]*)", txt, re.M):
            print(m.group(1), "::", m.group(2)[:160])
        return
    for name in names:
        # the instruction line (shows operands + the called computation)
        for m in re.finditer(
            rf"^\s+{re.escape(name)} = [^\n]*", txt, re.M
        ):
            print(m.group(0).strip()[:2000])
        # the fused computation body, if named conventionally
        cm = re.search(
            rf"^%?fused_computation[^\n]*{re.escape(name.split('.')[-1])}[^\n]*\n(.*?)^\}}",
            txt, re.M | re.S,
        )
        if cm:
            print(cm.group(0)[:4000])
        print("=" * 80)


if __name__ == "__main__":
    main()
