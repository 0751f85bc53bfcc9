"""Flagship-scale int8-vs-fp forward deviation on the real chip.

The CPU gate (tests/test_quant.py) runs the jnp mirror + interpret-mode
kernel on a tiny model; this probe measures the PRODUCTION path (pallas
int8 kernels, hd128 geometry, 128x256 grid) against the bf16 forward with
identical weights — the number PERF.md reports next to the speedup.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP, _build

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = dict(FLAGSHIP)
    cfg.update(heads=8, head_dim=128)
    pre_fp = _build(cfg)
    cfg_q = dict(cfg, quant="int8")
    pre_q = _build(cfg_q)

    rng = np.random.default_rng(0)
    H, W = cfg["img_resolution"]
    C, F = cfg["n_vars"], cfg["n_forcings"]
    params = jax.jit(lambda k: pre_fp.init(k), backend="cpu")(
        jax.random.PRNGKey(0)
    )
    # zero-init heads produce zero outputs — refill like the ensemble tests
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        (0.02 * rng.standard_normal(a.shape)).astype(a.dtype)
        if not np.any(np.asarray(a)) else np.asarray(a)
        for a in leaves
    ]
    params = jax.device_put(
        jax.tree_util.tree_unflatten(treedef, leaves), jax.devices()[0]
    )

    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, H, W, C + F)).astype(np.float32))
    aux = jnp.full((B, 1), 0.6, jnp.float32)
    t = jnp.full((B,), np.pi / 2, jnp.float32)

    def fwd(pre):
        return jax.jit(
            lambda p: pre.apply(p, x, t, condition=cond, auxiliary=aux)
        )(params)

    y_fp = np.asarray(fwd(pre_fp), np.float64)
    y_q = np.asarray(fwd(pre_q), np.float64)
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    mx = np.abs(y_q - y_fp).max() / np.abs(y_fp).std()
    print(f"int8 vs bf16 flagship forward @ B={B}: rel RMS {rel:.4f}, "
          f"max-abs/std {mx:.4f}")


if __name__ == "__main__":
    main()
