"""A/B the two fused attention kernels at the flagship 1.4° shape.

The whole-grid block kernel (`fused_block_attention`) owns one
(sample, head)'s full grid per program and gathers/scatters shifted windows
in VMEM; the window-tiled kernel (`fused_tiled_block_attention`, built for
0.25° where the whole grid exceeds VMEM) owns a tile of window rows and
takes the shift as one XLA roll. At 1.4° both are eligible — this probe
measures which is faster there (model dispatch picks "block"; PERF.md).

Run on the TPU host: python scripts/probe_attention_variants.py
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

from swift_tpu.ops.pallas_block_attention import (
    fused_block_attention,
    fused_tiled_block_attention,
)

B, GH, GW = 24, 64, 128
HEADS, D = 12, 88
WIN = (16, 16)
N = 12  # chained kernel applications per jit call (amortize dispatch)
REPS = 3


def _chain(kernel, shift):
    @jax.jit
    def run(qkv, scale):
        def body(c, _):
            o = kernel(c, scale, HEADS, WIN, shift=shift)
            # fold the output back into the carry so the chain is
            # sequentially dependent (identical cheap op for both variants)
            c2 = c + jnp.tile(o, (1, 1, 1, 3)).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, qkv, (), length=N)
        return c
    return run


def _device_time(tag, fn, qkv, scale):
    o = fn(qkv, scale)
    o.block_until_ready()
    outdir = f"/tmp/swift_probe_attn_{tag}"
    shutil.rmtree(outdir, ignore_errors=True)
    jax.profiler.start_trace(outdir)
    for _ in range(REPS):
        o = fn(qkv, scale)
    o.block_until_ready()
    jax.profiler.stop_trace()
    from scripts._trace import device_ms

    return device_ms(outdir, "jit_run", REPS * N) / 1e3


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, GH, GW, HEADS * 3 * D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.full((HEADS,), 10.0, jnp.float32)

    for shift in [(0, 0), (8, 8)]:
        for tag, kernel in [("block", fused_block_attention),
                            ("tiled", fused_tiled_block_attention)]:
            t0 = time.time()
            fn = _chain(kernel, shift)
            dt = _device_time(f"{tag}{shift[0]}", fn, qkv, scale)
            print(
                f"{tag:5s} shift={shift}: {dt * 1e3:7.3f} ms/call device "
                f"(compile+measure wall {time.time() - t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
