"""One 0.25° flagship TRAIN step on one chip (r3 VERDICT #3).

Usage: python scripts/probe_quarter_train.py [scm|trigflow]

sCM (jvp + fwd + bwd) measured ~20 GB at B=1 with the LEARNED pos embed
(1.1 GB of params + as much momentum; ledger in PERF.md) — multi-chip via
the latitude-sharded path was the answer then. The current defaults
(factorized pos embed + bf16 Muon momentum, the 0.25° config of record)
shed ~3 GB of args; whether the staged sCM step now fits a 16 GB v5e is
exactly what `probe_quarter_train.py scm` measures. TrigFlow (the
pretraining objective, no jvp) fits ONE 16 GB v5e.

736×1440 padded grid, batch 1, scan-over-layers remat on, full sCM loss
(primal + jvp forward + backward) + Muon update. Reports device s/step from
a profiler trace. The window-tiled block-attention kernel and its custom
vjp/jvp rules carry the attention work at this grid.
"""

from __future__ import annotations

import functools
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUTDIR = "/tmp/swift_probe_qtrain"


def log(m):
    print(m, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from swift_tpu.data.constants import default_variables_69
    from swift_tpu.models.precond import PassPrecond
    from swift_tpu.models.swinv2 import SwinV2
    from swift_tpu.training.loss import SCMLoss, TrigFlowLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    which = sys.argv[1] if len(sys.argv) > 1 else "trigflow"
    # geometry of record for 0.25° is hd128 + factorized pos embed
    # (era5-swinv2-0.25-scm.yaml); QT_GEOMETRY=parity / QT_POS_EMBED=learned
    # reproduce the r3 memory-ledger measurements.
    geometry = os.environ.get("QT_GEOMETRY", "hd128")
    pos_mode = os.environ.get("QT_POS_EMBED", "factorized")
    heads, head_dim = (8, 128) if geometry == "hd128" else (12, None)
    B, H, W = 1, 736, 1440
    C, F = 69, 3
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C + F, out_channels=C,
        window_size=(16, 16), shift_size=(8, 8), patch_size=(2, 2),
        depth=12, dim=1056, heads=heads, head_dim=head_dim,
        pos_embed_mode=pos_mode, auxiliary_dim=1, logvar=True,
        dtype=jnp.bfloat16, remat_layers=True, remat_blocks=os.environ.get("QT_REMAT_BLOCKS", "1") == "1",
    )
    log(f"geometry={geometry} pos_embed={pos_mode}")
    pre = PassPrecond(
        model=model, img_resolution=(H, W), img_channels=C,
        condition_channels=C + F, auxiliary_dim=1, sigma_data=1.0,
    )
    lkw = dict(
        precond=pre, lat_dim=H, variables=tuple(default_variables_69()),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    loss = (SCMLoss(tangent_warmup_kimg=10000, **lkw) if which == "scm"
            else TrigFlowLoss(**lkw))
    # QT_MOM_BF16=1: reduced-precision Muon momentum (another ~0.5 GB at
    # this grid; see muon.momentum_dtype).
    mom_dtype = jnp.bfloat16 if os.environ.get("QT_MOM_BF16", "1") == "1" else None
    optimizer = muon_with_aux_adam(muon_param_labels, lr=0.02, adam_lr=3e-4,
                                   momentum_dtype=mom_dtype)

    rng = np.random.default_rng(0)
    shapes = jax.eval_shape(lambda: pre.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: (0.02 * rng.standard_normal(s.shape)).astype(s.dtype), shapes
    )
    params = jax.device_put(params, jax.devices()[0])
    opt_state = jax.jit(optimizer.init)(params)
    jax.block_until_ready(opt_state)

    # TWO device programs (SCMLoss staged API): the jvp forward and the
    # main fwd+bwd+update don't fit one program at this grid — staging
    # makes the HBM peak max() of the stages instead of their sum.
    @jax.jit
    def jvp_stage(p, key, x, cond, aux):
        # bf16 handoff: halves the cross-program dF buffer
        return loss.jvp_term(p, key, x, condition=cond, auxiliary=aux,
                             out_dtype=jnp.bfloat16)

    # donate params/opt_state like the real Trainer's step — without it the
    # in/out copies alone overflow HBM at this grid (17.49 vs 15.75 GB).
    # x/cond/dF are donated too: not needed after the step, and the
    # freed arg space relieves the allocator (43% fragmentation here)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 3, 4, 6))
    def step(p, o, key, x, cond, aux, dF):
        def compute(pp):
            if which == "scm":
                return loss(pp, key, x, step=jnp.float32(1e5), condition=cond,
                            auxiliary=aux, dF_x=dF)
            return loss(pp, key, x, condition=cond, auxiliary=aux)

        l, grads = jax.value_and_grad(compute)(p)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
            grads,
        )
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return l, p, o

    x_np = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cond_np = rng.normal(size=(B, H, W, C + F)).astype(np.float32)
    aux = jnp.full((B, 1), 0.6, jnp.float32)

    def fresh():
        return jnp.asarray(x_np), jnp.asarray(cond_np)

    if os.environ.get("QT_MEM", "1") == "1":
        # AOT-compile both stages and print the HBM ledger before running
        # (same executable cache as the calls below, so no extra compile).
        sd = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)  # noqa: E731
        p_s, o_s = jax.tree_util.tree_map(sd, (params, opt_state))
        k_s = sd(jax.random.PRNGKey(0))
        x_s = jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)
        c_s = jax.ShapeDtypeStruct((B, H, W, C + F), jnp.float32)
        a_s = jax.ShapeDtypeStruct((B, 1), jnp.float32)
        d_s = jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16)
        for name, fn, args in (
            ("jvp_stage", jvp_stage, (p_s, k_s, x_s, c_s, a_s)),
            ("step", step, (p_s, o_s, k_s, x_s, c_s, a_s, d_s)),
        ):
            if name == "jvp_stage" and which != "scm":
                continue
            ma = fn.lower(*args).compile().memory_analysis()
            log(
                f"  {name}: args {ma.argument_size_in_bytes / 2**30:.2f} GB, "
                f"temp {ma.temp_size_in_bytes / 2**30:.2f} GB, "
                f"out {ma.output_size_in_bytes / 2**30:.2f} GB"
            )

    log("compile...")
    t0 = time.perf_counter()
    x, cond = fresh()
    dF = (jvp_stage(params, jax.random.PRNGKey(1), x, cond, aux)
          if which == "scm" else jnp.zeros((B, H, W, C), jnp.bfloat16))
    l, params, opt_state = step(params, opt_state, jax.random.PRNGKey(1), x,
                                cond, aux, dF)
    jax.block_until_ready(l)
    log(f"  {time.perf_counter() - t0:.1f}s; loss {float(l):.4f}")
    assert np.isfinite(float(l))

    from scripts._trace import start_device_trace

    shutil.rmtree(OUTDIR, ignore_errors=True)
    start_device_trace(OUTDIR)
    N = 2
    for i in range(N):
        k = jax.random.PRNGKey(i)
        x, cond = fresh()  # previous copies were donated into the step
        dF = (jvp_stage(params, k, x, cond, aux) if which == "scm"
              else jnp.zeros((B, H, W, C), jnp.bfloat16))
        l, params, opt_state = step(params, opt_state, k, x, cond, aux, dF)
    jax.block_until_ready(l)
    jax.profiler.stop_trace()

    from scripts._trace import device_ms

    dt = device_ms(OUTDIR, ("jit_step", "jit_jvp_stage"), N) / 1e3
    # FLOP model: fwd 2.72 TF at 1.4deg per sample x area ratio;
    # sCM = 6x fwd (fwd + jvp(2x) + bwd(3x... counted as 6x total like the
    # reference tflops model); trigflow = 3x fwd (fwd + bwd).
    fwd_tf = 2.72 * (736 * 1440) / (128 * 256) * B
    tf = (6 if which == "scm" else 3) * fwd_tf
    log(f"0.25deg {which} train step @ B={B}: {dt:.3f} s device = "
        f"{tf / dt:.0f} TF/s ({tf / dt / 197 * 100:.0f}% train MFU)")


if __name__ == "__main__":
    main()
