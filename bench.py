"""Headline benchmark: 6h forecast steps/sec/chip, 12-member ensemble.

North-star config (BASELINE.md): 12 members × 64 ICs × 60 steps @6h with the
flagship SwinV2 (reference experiment/era5-swinv2-1.4-scm.yaml:22-28; 1-step
sCM sampling per generate.py:255-261) on the 1.40625° grid (128×256, 69
variables + 3 forcings). Times the compiled ensemble rollout — sampler +
forcing concat + residual update — i.e. the per-chip device work of
``swift_tpu.generate``; prints ONE json line.

Model geometry: ONE run measures BOTH geometries so rounds stay comparable
(r3 ADVICE): the headline ``value``/``vs_baseline`` is the REFERENCE-PARITY
geometry (12×88 heads — the checkpoint-interchange config, apples-to-apples
with the reference GPU baseline and with BENCH_r1/r2), and the JSON also
carries ``hd128_steps_per_sec_per_chip`` for swift_tpu's config of record
for new training runs (``era5-swinv2-1.4-scm-hd128.yaml``: identical
depth 12 / dim 1056 / window 16 / patch 2 and identical per-sample model
FLOPs ~2.72e12, but MXU-native 8×128 heads instead of 12×88, which the
128-lane systolic array must zero-pad to 12×128 — a +45% qkv/attention pad
tax that exists on *any* 128-wide matrix hardware; r3 measured: hd128
437.8 ms vs parity 517 ms forward at B=24). ``SWIFT_BENCH_GEOMETRY``
(``both``/``parity``/``hd128``) restricts the run when time is short; the
headline stays the parity number whenever it is measured.

Measurement protocol: inputs are generated on device and only a scalar is
fetched per launch, so the number isolates sustained device throughput (the
dev harness reaches the chip through a slow loopback relay whose host<->
device link would otherwise dominate; on production TPU hosts feeding
happens at PCIe rate and is overlapped by the double-buffered pipeline).
The rate is measured over 8 ICs and is per-step constant, so it equals the
64-IC rate.

vs_baseline: the reference publishes no numbers (BASELINE.md). The
denominator is an analytic estimate of the reference per-A100 rate: eager
torch, one bf16 forward (~2.72 TFLOP/sample) per forecast step at ~30% MFU
on A100 312 TFLOP/s peak, minus the per-step device->host sync and h5
forcing reads of its Python loop (generate.py:97-136) => ~23 steps/s/GPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GEOMETRY = os.environ.get("SWIFT_BENCH_GEOMETRY", "both")
MEMBERS = 12
ICS = 64  # config of record; rate measured over MEASURE_ICS (identical rate)
MEASURE_ICS = 8
STEPS = 60
IC_CHUNK = 2
BASELINE_STEPS_PER_SEC_PER_GPU = 23.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_geometry(geometry: str) -> float:
    """Build the flagship at ``geometry`` and measure forecast steps/s/chip."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP, _build
    from swift_tpu.sampling.factory import param_sampler_factory

    H, W = FLAGSHIP["img_resolution"]
    C, F = FLAGSHIP["n_vars"], FLAGSHIP["n_forcings"]
    mb = MEMBERS * IC_CHUNK

    cfg = dict(FLAGSHIP)
    if geometry == "hd128":
        cfg.update(heads=8, head_dim=128)
    elif geometry == "int8":
        # hd128 + dynamically-quantized int8 qkv/FFN (SwinV2.quant — the
        # 2x-MXU-rate inference path). ACCURACY-AFFECTING (r4 measured 4.1%
        # rel-RMS forward deviation from bf16 on random weights) — reported
        # as an extra key, never the headline, until a real-data RMSE/CRPS
        # A/B blesses it (PERF.md lever (e)).
        cfg.update(heads=8, head_dim=128, quant="int8")
    precond = _build(cfg)

    # params: instant numpy build (values irrelevant for throughput),
    # shipped once as bf16 to halve the transfer.
    shapes = jax.eval_shape(lambda: precond.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            (0.02 * rng.standard_normal(s.shape, dtype=np.float32)).astype(
                np.float32
            )
        ),
        shapes,
    )
    jax.block_until_ready(params)
    log(f"[{geometry}] param build+transfer: {time.perf_counter() - t0:.1f}s")

    sampler = param_sampler_factory(
        "scm", precond, num_steps=1, sigma_min=0.02, sigma_max=200.0,
        auxiliary=0.6,
    )

    # ONE small jitted program (a single forecast step: forcing concat +
    # 1-step sCM sample + residual update); the 60-step rollout chains it
    # with device-resident state. Params cross the jit boundary as an
    # ARGUMENT — a closure would bake 0.9 GB of weights into the HLO as
    # constants. Steady-state throughput matches the lax.scan formulation
    # (steps are sequentially dependent either way).
    @jax.jit
    def step(params, X, key):
        f = jax.random.normal(jax.random.fold_in(key, 1), (mb, H, W, F))
        cond = jnp.concatenate([X, f], axis=-1)
        Y = sampler(params, cond, key)
        # residual update (identity stats: same fused affine cost); the
        # clip keeps the random-weight state bounded over 240 chained steps
        # (real runs standardize instead — same elementwise cost class).
        return jnp.clip(X + Y, -50.0, 50.0)

    rng2 = np.random.default_rng(1)
    X = jnp.asarray(rng2.standard_normal((mb, H, W, C), dtype=np.float32))
    t0 = time.perf_counter()
    X = step(params, X, jax.random.PRNGKey(0))
    s = float(X.sum())
    log(f"[{geometry}] compile+warmup: {time.perf_counter() - t0:.1f}s "
        f"(sum={s:.3e})")

    n_launches = MEASURE_ICS // IC_CHUNK
    t0 = time.perf_counter()
    for i in range(n_launches):
        for k in range(STEPS):
            X = step(params, X, jax.random.PRNGKey(1000 * i + k + 1))
    acc = float(X.sum())  # forces completion of the whole chain
    wall = time.perf_counter() - t0
    assert np.isfinite(acc)

    n_devices = jax.local_device_count()
    measured_steps = MEMBERS * MEASURE_ICS * STEPS
    value = measured_steps / wall / n_devices
    log(
        f"[{geometry}] {measured_steps} forecast steps in {wall:.1f}s on "
        f"{n_devices} chip(s); model MFU ~ "
        f"{measured_steps * 2.72e12 / wall / n_devices / 197e12 * 100:.1f}%"
    )
    return value


TRAIN_BATCH = 16
TRAIN_STEPS = 5  # steps per scanned launch; timed launch = one dispatch


def bench_train(geometry: str) -> float:
    """One jitted sCM train step (value_and_grad + clamp + Muon + EMA-free
    probe form) at B=16, seconds/step — the reference's train/tflops tick
    metric is the bar (reference trainer.py:437-438). TRAIN_STEPS steps run
    inside ONE ``lax.scan`` launch so the dev tunnel's per-dispatch cost
    (~3 s for the 700-leaf train-step signature, PERF.md) amortizes away;
    wall/TRAIN_STEPS then tracks the device trace number within ~5%."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from __graft_entry__ import FLAGSHIP, _build
    from swift_tpu.data.constants import default_variables_69
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import clamp_grads, muon_param_labels

    B = TRAIN_BATCH
    cfg = dict(FLAGSHIP)
    if geometry == "hd128":
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
        lambda s: jnp.asarray(
            (0.02 * rng.standard_normal(s.shape)).astype(s.dtype)
        ),
        shapes,
    )
    opt_state = jax.jit(optimizer.init)(params)
    jax.block_until_ready(opt_state)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(p, o, x, cond, aux, keys):
        def body(carry, k):
            p, o = carry

            def compute(pp):
                return loss(pp, k, x, step=jnp.float32(1e5),
                            condition=cond, auxiliary=aux)

            l, grads = jax.value_and_grad(compute)(p)
            grads = clamp_grads(grads)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), l

        (p, o), ls = jax.lax.scan(body, (p, o), keys)
        return ls, p, o

    H, W = FLAGSHIP["img_resolution"]
    C, F = FLAGSHIP["n_vars"], FLAGSHIP["n_forcings"]
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(B, H, W, C + F)).astype(np.float32))
    aux = jnp.full((B, 1), 0.6, jnp.float32)

    keys = jax.random.split(jax.random.PRNGKey(1), TRAIN_STEPS)
    t0 = time.perf_counter()
    ls, params, opt_state = multi_step(params, opt_state, x, cond, aux, keys)
    jax.block_until_ready(ls)
    log(f"[train-{geometry}] compile+warmup ({TRAIN_STEPS} steps): "
        f"{time.perf_counter() - t0:.1f}s loss={float(ls[-1]):.3f}")

    keys = jax.random.split(jax.random.PRNGKey(2), TRAIN_STEPS)
    t0 = time.perf_counter()
    ls, params, opt_state = multi_step(params, opt_state, x, cond, aux, keys)
    jax.block_until_ready(ls)
    sec = (time.perf_counter() - t0) / TRAIN_STEPS
    assert np.isfinite(float(ls[-1]))
    # 6x-forward FLOP model (PERF.md): primal + jvp (2x) + remat'd bwd (3x).
    mfu = 6 * 2.72e12 * B / sec / 197e12
    log(f"[train-{geometry}] sCM train step @ B={B}: {sec:.3f} s/step "
        f"({B / sec:.1f} img/s/chip, ~{mfu * 100:.1f}% train MFU)")
    return sec


def main():
    import jax

    # persistent compile cache: the dev tunnel's remote compile is slow
    # (minutes); cache so repeat runs (and the driver's run) start hot.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    # the dev tunnel drops idle connections (~90 s); a cold run's long
    # remote compiles would otherwise orphan the PJRT handle mid-bench.
    from swift_tpu.utils.io import start_device_keepalive

    start_device_keepalive()

    geometries = (
        ["parity", "hd128", "int8"] if GEOMETRY == "both" else [GEOMETRY]
    )
    results = {}
    for g in geometries:
        results[g] = bench_geometry(g)
        jax.clear_caches()  # drop the previous geometry's live buffers

    # driver-verified TRAINING throughput (r4 VERDICT missing #3): one
    # scanned jitted sCM train step per geometry at B=16.
    train = {}
    if os.environ.get("SWIFT_BENCH_TRAIN", "1") != "0":
        for g in geometries:
            if g == "int8":
                continue  # int8 is an inference-only path
            train[g] = bench_train(g)
            jax.clear_caches()

    # headline = the reference-parity geometry whenever it was measured
    # (apples-to-apples with the reference baseline and prior rounds).
    head = "parity" if "parity" in results else "hd128"
    out = {
        "metric": "forecast_steps_per_sec_per_chip",
        "value": round(results[head], 2),
        "unit": (
            "6h-steps/s/chip (12-member ensemble, flagship SwinV2 "
            f"[{head} heads, ~2.72 TFLOP/sample], 1-step sCM)"
        ),
        "vs_baseline": round(results[head] / BASELINE_STEPS_PER_SEC_PER_GPU, 2),
    }
    if "hd128" in results and head != "hd128":
        out["hd128_steps_per_sec_per_chip"] = round(results["hd128"], 2)
    if "int8" in results and head != "int8":
        # opt-in accuracy-affecting path; see bench_geometry("int8") note
        out["hd128_int8_steps_per_sec_per_chip"] = round(results["int8"], 2)
    for g, sec in train.items():
        out[f"train_step_seconds_{g}"] = round(sec, 3)
        out[f"train_mfu_{g}"] = round(6 * 2.72e12 * TRAIN_BATCH / sec / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
