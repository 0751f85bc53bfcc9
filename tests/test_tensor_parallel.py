"""Tensor parallelism: sharded params produce identical outputs and a
working train step over a (data, model) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swift_tpu.models.precond import PassPrecond
from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.parallel.sharding import shard_params, swinv2_param_shardings
from swift_tpu.training.loss import TrigFlowLoss
from swift_tpu.training.trainer import Trainer

H, W, C = 8, 16, 4


def make(dim=64, heads=4):
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=dim, heads=heads, logvar=True, dtype=jnp.float32,
        use_pallas=False,
    )
    return PassPrecond(model=model, img_resolution=(H, W), img_channels=C,
                       condition_channels=C, sigma_data=1.0)


def test_sharding_rules_split_the_right_axes():
    p = make()
    params = p.init(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    shardings = swinv2_param_shardings(params, mesh)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    assert flat["pairs/even/attn/to_qkv/kernel"].spec == P(None, None, "model")
    assert flat["pairs/even/attn/wo/kernel"].spec == P(None, "model", None)
    assert flat["pairs/even/ff/w1/kernel"].spec == P(None, None, "model")
    assert flat["pairs/even/ff/w2/kernel"].spec == P(None, "model", None)
    assert flat["pos_embed"].spec == P()
    assert flat["patch_embed/kernel"].spec == P()


def test_tp_forward_matches_replicated():
    p = make()
    params = p.init(jax.random.PRNGKey(0))
    # non-trivial weights (zero-init head would hide errors)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.default_rng(0).standard_normal(a.shape).astype(np.float32),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (4, H, W, C))
    t = jnp.array([0.5, 1.0, 0.2, 0.9])

    y_ref = p.apply(params, x, t, condition=cond)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        sharded = shard_params(params, mesh)
        xb = jax.device_put(x, NamedSharding(mesh, P("data")))
        y_tp = jax.jit(
            lambda pp, xx: p.apply(pp, xx, t, condition=cond)
        )(sharded, xb)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_spatial_parallel_forward_matches():
    """SP: batch-1 forward with the latitude axis sharded over 8 devices
    reproduces the replicated result (the 0.25° scaling path)."""
    from swift_tpu.parallel.sharding import spatial_sharding

    p = make()
    params = p.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.default_rng(1).standard_normal(a.shape).astype(np.float32),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, C))
    t = jnp.array([0.5])
    y_ref = p.apply(params, x, t, condition=cond)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sp = spatial_sharding(mesh, 4)
    xs = jax.device_put(x, sp)
    cs = jax.device_put(cond, sp)
    y_sp = jax.jit(lambda pp, a, b: p.apply(pp, a, t, condition=b))(params, xs, cs)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    assert not y_sp.sharding.is_fully_replicated


def test_tp_train_step():
    """Full train step with params sharded over model axis + batch over data."""
    p = make()
    loss = TrigFlowLoss(
        precond=p, lat_dim=H,
        variables=("2m_temperature", "geopotential_500", "temperature_850",
                   "specific_humidity_700"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
    )
    tr = Trainer(p, optax.adamw(1e-3), loss, global_batch_size=4,
                 total_kimg=1, run_dir="/tmp/tp_test", checkpoint_ticks=None,
                 val_ticks=None)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    state = tr.state
    sharded_params = shard_params(state.params, mesh)
    sharded_ema = shard_params(state.ema, mesh)
    opt_state = jax.device_put(state.opt_state, NamedSharding(mesh, P()))
    state = type(state)(sharded_params, sharded_ema, opt_state, state.nimg)

    k = jax.random.PRNGKey(0)
    batch = {
        "x": jax.device_put(
            jax.random.normal(k, (4, H, W, C)), NamedSharding(mesh, P("data"))
        ),
        "t": jax.device_put(
            jax.random.normal(jax.random.fold_in(k, 1), (4, H, W, C)),
            NamedSharding(mesh, P("data")),
        ),
        "idx": jnp.arange(4, dtype=jnp.int32),
        "delta": jnp.full((4, 1), 0.6),
    }
    step = tr._get_step(1, None)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # TP params keep their sharding through the update
    qkv = new_state.params["pairs"]["even"]["attn"]["to_qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


def make_tp(mesh, dim=64, heads=4):
    """Same architecture as ``make()`` but with activation sharding
    constraints enabled (SwinV2.mesh/data_axis/model_axis)."""
    model = SwinV2(
        img_resolution=(H, W), in_channels=2 * C, out_channels=C,
        window_size=(2, 2), shift_size=(1, 1), patch_size=(2, 2),
        depth=2, dim=dim, heads=heads, logvar=True, dtype=jnp.float32,
        use_pallas=False, mesh=mesh, data_axis="data", model_axis="model",
    )
    return PassPrecond(model=model, img_resolution=(H, W), img_channels=C,
                       condition_channels=C, sigma_data=1.0)


def test_tp_constrained_forward_matches_replicated():
    """The mesh-annotated model (with_sharding_constraint on activations)
    reproduces the unconstrained replicated forward exactly."""
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    p = make()
    p_tp = make_tp(mesh)
    params = p.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.random.default_rng(3)
        .standard_normal(a.shape).astype(np.float32),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(2), (4, H, W, C))
    t = jnp.array([0.5, 1.0, 0.2, 0.9])
    y_ref = p.apply(params, x, t, condition=cond)

    sharded = shard_params(params, mesh)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_tp = jax.jit(lambda pp, xx: p_tp.apply(pp, xx, t, condition=cond))(
        sharded, xb
    )
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_train_step_matches_replicated():
    """One sCM train step under (data, model) TP == the replicated step
    (same batch, same key) — VERDICT r1 item #4's done-criterion."""
    from swift_tpu.training.loss import SCMLoss

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    variables = ("2m_temperature", "geopotential_500",
                 "temperature_850", "specific_humidity_700")
    noise = {"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0}

    def run(p, sharded):
        loss = SCMLoss(precond=p, lat_dim=H, variables=variables,
                       noise=noise, tangent_warmup_kimg=1)
        tr = Trainer(p, optax.adamw(1e-3), loss, global_batch_size=4,
                     total_kimg=1, run_dir="/tmp/tp_eq_test",
                     checkpoint_ticks=None, val_ticks=None, seed=0)
        state = tr.state
        batch = {
            "x": np.asarray(jax.random.normal(jax.random.PRNGKey(1), (4, H, W, C))),
            "t": np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, H, W, C))),
            "idx": np.arange(4, dtype=np.int32),
            "delta": np.full((4, 1), 0.6, np.float32),
        }
        if sharded:
            state = type(state)(
                shard_params(state.params, mesh),
                shard_params(state.ema, mesh),
                jax.device_put(state.opt_state, NamedSharding(mesh, P())),
                state.nimg,
            )
            batch = {
                k: jax.device_put(
                    v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
                )
                for k, v in batch.items()
            }
        step = tr._get_step(1, None)
        new_state, m = step(state, batch, jax.random.PRNGKey(3))
        return new_state, float(m["loss"])

    state_rep, loss_rep = run(make(), sharded=False)
    state_tp, loss_tp = run(make_tp(mesh), sharded=True)
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_rep.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_quarter_degree_spatial_sharded_forecast():
    """0.25°-class scaling (SURVEY §5.7 / VERDICT r1 stretch): a 721×1440
    input is edge-padded to 736 lat rows (patch 2 × window 16 aligned),
    the batch-1 forward runs with the latitude axis sharded over all 8
    devices, and the cropped result matches the replicated forward."""
    from swift_tpu.parallel.sharding import (
        crop_lat, pad_lat_to_grid, spatial_sharding,
    )

    Hq, Wq, Cq = 721, 512, 2  # full 0.25° lat; lon reduced to bound CPU test cost
    model = SwinV2(
        img_resolution=(736, Wq), in_channels=2 * Cq, out_channels=Cq,
        window_size=(16, 16), shift_size=(8, 8), patch_size=(2, 2),
        depth=2, dim=32, heads=2, dtype=jnp.float32, use_pallas=False,
    )
    p = PassPrecond(model=model, img_resolution=(736, Wq), img_channels=Cq,
                    condition_channels=Cq, sigma_data=1.0)
    params = p.init(jax.random.PRNGKey(0))
    params["head"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(9), params["head"]["kernel"].shape
    )

    rng = np.random.default_rng(0)
    x_raw = rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32)
    c_raw = rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32)
    x_pad, orig = pad_lat_to_grid(x_raw, 2, 16)
    c_pad, _ = pad_lat_to_grid(c_raw, 2, 16)
    assert x_pad.shape[1] == 736 and orig == Hq

    t = jnp.array([np.pi / 2], jnp.float32)
    fwd = jax.jit(lambda pp, a, b: p.apply(pp, a, t, condition=b))

    y_ref = np.asarray(fwd(params, jnp.asarray(x_pad), jnp.asarray(c_pad)))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sp = spatial_sharding(mesh, 4)  # 736 lat rows / 8 devices = 92 each
    xs = jax.device_put(jnp.asarray(x_pad), sp)
    cs = jax.device_put(jnp.asarray(c_pad), sp)
    y_sp = fwd(params, xs, cs)
    assert not y_sp.sharding.is_fully_replicated
    np.testing.assert_allclose(
        crop_lat(np.asarray(y_sp), orig), crop_lat(y_ref, orig),
        rtol=2e-4, atol=2e-4,
    )


def test_quarter_degree_spatial_sharded_scm_train_step():
    """The multi-chip answer for 0.25° sCM training (r3): a single-chip
    B=1 sCM step needs ~17 GB (PERF.md memory ledger), so production runs
    shard the LATITUDE axis. This proves the full sCM train step — jvp
    forward + fwd + bwd + Muon update — compiles and executes with the
    batch-1 activations latitude-sharded over all 8 devices, and matches
    the replicated step's loss and updated params."""
    import optax

    from swift_tpu.parallel.sharding import spatial_sharding
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    Hq, Wq, Cq = 64, 32, 2  # lat 64 / 8 devices = 8 rows each
    model = SwinV2(
        img_resolution=(Hq, Wq), in_channels=2 * Cq, out_channels=Cq,
        window_size=(4, 4), shift_size=(2, 2), patch_size=(2, 2),
        depth=2, dim=32, heads=2, auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, use_pallas=False,
    )
    p = PassPrecond(model=model, img_resolution=(Hq, Wq), img_channels=Cq,
                    condition_channels=Cq, auxiliary_dim=1, sigma_data=1.0)
    params = p.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=p, lat_dim=Hq,
        variables=("2m_temperature", "geopotential_500"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    optimizer = muon_with_aux_adam(muon_param_labels, lr=0.02, adam_lr=3e-4)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32))
    aux = jnp.full((1, 1), 0.6)

    @jax.jit
    def step(pp, oo, x, cond):
        l, grads = jax.value_and_grad(
            lambda q: loss(q, jax.random.PRNGKey(5), x, step=100.0,
                           condition=cond, auxiliary=aux)
        )(pp)
        updates, oo = optimizer.update(grads, oo, pp)
        return l, optax.apply_updates(pp, updates)

    l_ref, p_ref = step(params, opt_state, x, cond)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sp = spatial_sharding(mesh, 4)
    xs = jax.device_put(x, sp)
    cs = jax.device_put(cond, sp)
    with mesh:
        l_sp, p_sp = step(params, opt_state, xs, cs)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_quarter_degree_record_config_spatial_sharded_train_step():
    """The 0.25° config of record (era5-swinv2-0.25-scm.yaml) composes three
    TPU-first levers: factorized pos embed, decoupled head_dim, and bf16
    Muon momentum. This proves the full sCM train step with that feature
    combination runs latitude-sharded over 8 devices and matches the
    replicated step (same structure as the learned-mode test above)."""
    import optax

    from swift_tpu.parallel.sharding import spatial_sharding
    from swift_tpu.training.loss import SCMLoss
    from swift_tpu.training.optimizers import muon_with_aux_adam
    from swift_tpu.training.trainer import muon_param_labels

    Hq, Wq, Cq = 64, 32, 2
    model = SwinV2(
        img_resolution=(Hq, Wq), in_channels=2 * Cq, out_channels=Cq,
        window_size=(4, 4), shift_size=(2, 2), patch_size=(2, 2),
        depth=2, dim=32, heads=2, head_dim=24,  # inner 48 != dim
        pos_embed_mode="factorized", auxiliary_dim=1, logvar=True,
        dtype=jnp.float32, use_pallas=False,
    )
    p = PassPrecond(model=model, img_resolution=(Hq, Wq), img_channels=Cq,
                    condition_channels=Cq, auxiliary_dim=1, sigma_data=1.0)
    params = p.init(jax.random.PRNGKey(0))
    loss = SCMLoss(
        precond=p, lat_dim=Hq,
        variables=("2m_temperature", "geopotential_500"),
        noise={"dist": "loguniform", "sigma_min": 0.02, "sigma_max": 200.0},
        tangent_warmup_kimg=1,
    )
    optimizer = muon_with_aux_adam(
        muon_param_labels, lr=0.02, adam_lr=3e-4,
        momentum_dtype=jnp.bfloat16,
    )
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((1, Hq, Wq, Cq)).astype(np.float32))
    aux = jnp.full((1, 1), 0.6)

    @jax.jit
    def step(pp, oo, x, cond):
        l, grads = jax.value_and_grad(
            lambda q: loss(q, jax.random.PRNGKey(5), x, step=100.0,
                           condition=cond, auxiliary=aux)
        )(pp)
        updates, oo = optimizer.update(grads, oo, pp)
        return l, optax.apply_updates(pp, updates)

    l_ref, p_ref = step(params, opt_state, x, cond)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sp = spatial_sharding(mesh, 4)
    xs = jax.device_put(x, sp)
    cs = jax.device_put(cond, sp)
    with mesh:
        l_sp, p_sp = step(params, opt_state, xs, cs)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
