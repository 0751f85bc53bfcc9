"""Profile the flagship forward at the bench batch and aggregate op times.

Dumps a jax.profiler trace, then parses the chrome-trace json to attribute
device time to XLA ops (fusion names), printing the top consumers. This is
the measurement tool behind PERF.md's "where the time goes" section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 24
OUTDIR = "/tmp/swift_profile"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP, _build

    cfg = dict(FLAGSHIP)
    if "hd128" in sys.argv[2:]:
        # the MXU-native head-width variant (experiment
        # era5-swinv2-1.4-scm-hd128.yaml): 8 x 128 heads, zero qkv pad tax
        cfg.update(heads=8, head_dim=128)
    if "int8" in sys.argv[2:]:
        # dynamic int8 qkv/FFN (SwinV2.quant, PERF.md lever (e))
        cfg.update(quant="int8")
    precond = _build(cfg)
    rng = np.random.default_rng(0)

    H, W = FLAGSHIP["img_resolution"]
    C, F = FLAGSHIP["n_vars"], FLAGSHIP["n_forcings"]

    log("building params on host...")
    params = jax.jit(lambda k: precond.init(k), backend="cpu")(jax.random.PRNGKey(0))
    params = jax.device_put(jax.tree_util.tree_map(np.asarray, params), jax.devices()[0])

    @jax.jit
    def fwd(params, x, cond, aux):
        t = jnp.full((x.shape[0],), np.pi / 2, jnp.float32)
        return precond.apply(params, x, t, condition=cond, auxiliary=aux)

    x = jnp.asarray(rng.normal(size=(BATCH, H, W, C)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(BATCH, H, W, C + F)).astype(np.float32))
    aux = jnp.full((BATCH, 1), 0.6, jnp.float32)

    log("compile+warmup...")
    t0 = time.perf_counter()
    fwd(params, x, cond, aux).block_until_ready()
    log(f"  {time.perf_counter() - t0:.1f}s")

    for _ in range(2):
        fwd(params, x, cond, aux).block_until_ready()
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        o = fwd(params, x, cond, aux)
    o.block_until_ready()
    per = (time.perf_counter() - t0) / N
    log(f"forward at B={BATCH}: {per * 1e3:.1f} ms")

    jax.profiler.start_trace(OUTDIR)
    for _ in range(3):
        o = fwd(params, x, cond, aux)
    o.block_until_ready()
    jax.profiler.stop_trace()

    from scripts._trace import device_op_totals

    agg, cnt = device_op_totals(OUTDIR)
    if not agg:
        return
    log(f"\ntotal device-track time over 3 steps: {sum(agg.values()):.1f} ms")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    for name, ms in rows:
        print(f"{ms / 3:9.2f} ms/step  x{cnt[name] // 3:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
