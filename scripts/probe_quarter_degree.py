"""0.25° (721×1440 → padded 736×1440) flagship-class forward on one chip.

Demonstrates the resolution-scaling path: `pad_lat_to_grid` brings the
721-row WB2 latitude axis to a patch×window-aligned 736; the WINDOW-TILED
block-attention kernel (r3, fused_tiled_block_attention) engages at this
grid — the whole-grid kernel's VMEM gate rejects it (135 MB tile) and used
to drop to the per-head path at 34% MFU. Reports device s/forward from a
profiler trace (wall clock through the dev tunnel is dispatch-bound).
"""

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from swift_tpu.models.precond import PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.parallel.sharding import crop_lat, pad_lat_to_grid


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    hd128 = "hd128" in sys.argv[2:]
    int8 = "int8" in sys.argv[2:]
    H_RAW, W = 721, 1440
    C, F = 69, 3
    PATCH, WIN = 2, 16
    model = SwinV2(
        img_resolution=(736, W), in_channels=2 * C + F, out_channels=C,
        window_size=(WIN, WIN), shift_size=(8, 8), patch_size=(PATCH, PATCH),
        depth=12, dim=1056, heads=8 if hd128 else 12,
        head_dim=128 if hd128 else None, auxiliary_dim=1, logvar=True,
        dtype=jnp.bfloat16, quant="int8" if int8 else None,
    )
    pre = PassPrecond(
        model=model, img_resolution=(736, W), img_channels=C,
        condition_channels=C + F, auxiliary_dim=1, sigma_data=1.0,
    )
    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype),
        shapes,
    )
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def fwd(params, x, cond, aux):
        xp, _ = pad_lat_to_grid(x, PATCH, WIN)
        cp, _ = pad_lat_to_grid(cond, PATCH, WIN)
        t = jnp.full((x.shape[0],), np.pi / 2, jnp.float32)
        arg = jnp.concatenate([xp, cp], axis=-1)
        out = model.apply({"params": params}, arg, t,
                          auxiliary=jnp.full((x.shape[0], 1), 0.6))
        return crop_lat(out, H_RAW)

    x = jnp.asarray(rng.normal(size=(B, H_RAW, W, C)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, H_RAW, W, C + F)).astype(np.float32))

    print("compile...", flush=True)
    t0 = time.time()
    o = fwd(params, x, cond, None)
    o.block_until_ready()
    print(f"  {time.time() - t0:.1f}s; out {o.shape}", flush=True)
    assert bool(jnp.isfinite(o).all())

    N = 3
    outdir = "/tmp/swift_probe_qdeg"
    shutil.rmtree(outdir, ignore_errors=True)
    jax.profiler.start_trace(outdir)
    for _ in range(N):
        o = fwd(params, x, cond, None)
    o.block_until_ready()
    jax.profiler.stop_trace()

    from scripts._trace import device_ms

    dt = device_ms(outdir, "jit_fwd", N) / 1e3
    # ~8.8x the 1.4-degree per-sample forward flops (2.72 TF)
    tf = 2.72 * (736 * 1440) / (128 * 256) * B
    print(f"0.25deg forward @ B={B}: {dt:.3f} s device = {tf / dt:.0f} TF/s "
          f"({tf / dt / 197 * 100:.0f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
