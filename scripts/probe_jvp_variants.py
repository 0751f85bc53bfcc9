"""Measure the sCM jvp forward (primal+tangent) at B=16 under the four
combinations of {FFN jvp kernel, modnorm jvp kernel} on/off, by patching the
fused entries to raise ValueError (the model's normal fallback path).

Timing is TRACE-BASED (device op totals), not wall clock — wall clock
through the dev tunnel is dispatch-bound and unreliable (PERF.md).

Decides whether the r3 jvp-capable kernels stay enabled per-site — the r2
ledger predicted the FFN one is a wash by arithmetic (CLAUDE.md rule 5).
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

BATCH = 16
OUTDIR = "/tmp/swift_probe_jvp"


def log(m):
    print(m, flush=True)


def _device_ms_per_step(outdir, n_steps):
    from scripts._trace import device_ms

    return device_ms(outdir, "jit_jvp_fwd", n_steps)


def main():
    import os

    # Force the fused jvp routing at the flagship grid (8192 tokens is far
    # below the 65536 default threshold): without this the model takes the
    # jnp jvp path in all four combos and the A/B measures nothing.
    os.environ.setdefault("SWIFT_JVP_FUSED_MIN_TOKENS", "1")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import swift_tpu.ops.pallas_ffn as pf
    import swift_tpu.ops.pallas_modnorm as pm
    from __graft_entry__ import FLAGSHIP, _build

    pre = _build(FLAGSHIP)
    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype), shapes
    )
    params = jax.device_put(params, jax.devices()[0])

    x = jnp.asarray(rng.normal(size=(BATCH, 128, 256, 69)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(BATCH, 128, 256, 72)).astype(np.float32))
    aux = jnp.full((BATCH, 1), 0.6, jnp.float32)
    t = jnp.full((BATCH, 1, 1, 1), 0.8, jnp.float32)
    vx = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    orig_ffn = pf.fused_swiglu_ffn
    orig_mn = pm.sharded_modnorm_residual

    def ffn_off(x, w1, w2, jvp=False):
        if jvp:
            raise ValueError("ffn jvp fusion disabled for probe")
        return orig_ffn(x, w1, w2, jvp=jvp)

    def mn_off(*args, jvp=False, **kw):
        if jvp:
            raise ValueError("modnorm jvp fusion disabled for probe")
        return orig_mn(*args, jvp=jvp, **kw)

    results = {}
    for ffn_on in (True, False):
        for mn_on in (True, False):
            pf.fused_swiglu_ffn = orig_ffn if ffn_on else ffn_off
            pm.sharded_modnorm_residual = orig_mn if mn_on else mn_off

            def jvp_fwd(p, x, t, cond, aux, vx):
                def wrapper(xi, ti):
                    return pre.apply(p, xi, ti, cond, aux, jvp=True)

                _, dF = jax.jvp(wrapper, (x, t), (vx, 0.4 * jnp.ones_like(t)))
                return dF

            fn = jax.jit(jvp_fwd)
            r = fn(params, x, t, cond, aux, vx)
            jax.block_until_ready(r)

            shutil.rmtree(OUTDIR, ignore_errors=True)
            jax.profiler.start_trace(OUTDIR)
            N = 3
            for _ in range(N):
                r = fn(params, x, t, cond, aux, vx)
            jax.block_until_ready(r)
            jax.profiler.stop_trace()
            ms = _device_ms_per_step(OUTDIR, N)
            results[(ffn_on, mn_on)] = ms
            log(f"ffn_fused={ffn_on} modnorm_fused={mn_on}: {ms:.1f} ms device")

    pf.fused_swiglu_ffn = orig_ffn
    pm.sharded_modnorm_residual = orig_mn


if __name__ == "__main__":
    main()
