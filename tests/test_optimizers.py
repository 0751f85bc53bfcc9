"""Optimizer tests: Newton-Schulz orthogonality, Muon/MARS descent."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from swift_tpu.training.optimizers import mars, muon, muon_with_aux_adam, newton_schulz


def test_newton_schulz_orthogonalizes():
    g = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    x = newton_schulz(g, steps=5).astype(jnp.float32)
    s = np.linalg.svd(np.asarray(x), compute_uv=False)
    # quintic NS targets singular values ~ Uniform(0.5, 1.5) (reference
    # muon.py docstring) — check they're far from 0 and bounded.
    assert s.min() > 0.2 and s.max() < 1.8


def test_newton_schulz_tall_and_wide_consistent():
    g = jax.random.normal(jax.random.PRNGKey(1), (16, 48))
    a = newton_schulz(g).astype(jnp.float32)
    b = newton_schulz(g.T).astype(jnp.float32).T
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)


def _quadratic_descent(opt, params, steps=25):
    target = jax.tree_util.tree_map(jnp.ones_like, params)

    def loss(p):
        return sum(
            jnp.sum((a - b) ** 2)
            for a, b in zip(
                jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(target)
            )
        )

    state = opt.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    for i in range(steps):
        params, state = step(params, state)
    return l0, float(loss(params))


def test_muon_descends():
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(0), (8, 16)) * 0.1,
    }
    # Muon steps have unit spectral norm: progress per step is ~lr in every
    # singular direction, so give it enough steps to cross the ~1.0 gap.
    l0, l1 = _quadratic_descent(muon(learning_rate=0.05), params, steps=300)
    assert l1 < l0 * 0.2


def test_muon_with_aux_adam_routing():
    params = {
        "block0": {"k": jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.1},
        "bias": {"b": jnp.zeros((8,))},
    }

    def labels(p):
        return {
            "block0": {"k": "muon"},
            "bias": {"b": "adam"},
        }

    opt = muon_with_aux_adam(labels, lr=0.05, adam_lr=0.05)
    l0, l1 = _quadratic_descent(opt, params, steps=300)
    assert l1 < l0 * 0.2


@pytest.mark.parametrize("mtype", ["mars-adamw", "mars-lion", "mars-shampoo"])
def test_mars_descends(mtype):
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.1,
        "b": jnp.zeros((8,)),
    }
    opt = mars(learning_rate=0.05, lr_1d=0.05, mars_type=mtype, weight_decay=0.0,
               weight_decay_1d=0.0)
    l0, l1 = _quadratic_descent(opt, params)
    assert l1 < l0 * 0.8, f"{mtype}: {l0} -> {l1}"


def test_muon_sharded_ns_matches_unsharded():
    """Stacked-layer NS sharded over an 8-device mesh == the replicated
    computation (the mesh analogue of reference muon.py:88-110)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    params = {
        "stack": jax.random.normal(jax.random.PRNGKey(0), (6, 16, 32)) * 0.1,
        "mat": jax.random.normal(jax.random.PRNGKey(1), (16, 16)) * 0.1,
    }
    grads = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    opt_ref = muon(learning_rate=0.05)
    opt_shard = muon(learning_rate=0.05, mesh=mesh)
    with mesh:
        u_ref, _ = opt_ref.update(grads, opt_ref.init(params), params)
        u_shard, _ = opt_shard.update(grads, opt_shard.init(params), params)
    for a, b in zip(
        jax.tree_util.tree_leaves(u_ref), jax.tree_util.tree_leaves(u_shard)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-2)


def test_mars_jittable():
    params = {"w": jnp.ones((4, 4))}
    opt = mars(learning_rate=0.01)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.tree_util.tree_map(jnp.ones_like, p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    p, s = step(params, state)
    assert jnp.isfinite(p["w"]).all()


def test_muon_sharded_ns_both_axes_matches_unsharded():
    """NS work sharded over the FLATTENED (data, model) device set — the
    dp x tp default — matches the unsharded update."""
    import numpy as np
    from jax.sharding import Mesh

    from swift_tpu.training.optimizers.muon import scale_by_muon

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    params = {
        "stack": jnp.zeros((6, 16, 24)),  # 6 doesn't divide 8 -> padding
        "vec": jnp.zeros((16,)),
    }
    grads = {
        "stack": jax.random.normal(jax.random.PRNGKey(0), (6, 16, 24)),
        "vec": jax.random.normal(jax.random.PRNGKey(1), (16,)),
    }
    ref_tx = scale_by_muon(mesh=None)
    tx = scale_by_muon(mesh=mesh, shard_axis=("data", "model"))
    ref_up, _ = ref_tx.update(grads, ref_tx.init(params), params)
    up, _ = jax.jit(lambda g, s, p: tx.update(g, s, p))(
        grads, tx.init(params), params
    )
    for k in params:
        np.testing.assert_allclose(
            np.asarray(up[k]), np.asarray(ref_up[k]), rtol=2e-2, atol=2e-2
        )


def test_muon_tp_aware_ns_matches_and_avoids_full_gather():
    """TP-aware NS (r2 VERDICT #6): stacked params whose feature dim is
    sharded over `model` take the all_to_all path. Must (a) match the
    unsharded update, (b) compile WITHOUT any all-gather that materializes
    the full stacked momentum on a device (the old replicate->slice staging
    did exactly that every step)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from swift_tpu.training.optimizers.muon import scale_by_muon

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    # column-parallel qkv-like: (stack, in, out) with out over model;
    # row-parallel w2-like: (stack, hidden, out) with hidden over model.
    specs = {
        "qkv": P(None, None, "model"),
        "w2": P(None, "model", None),
    }
    params = {
        "qkv": jnp.zeros((6, 16, 24)),
        "w2": jnp.zeros((6, 24, 16)),
    }
    grads = {
        "qkv": jax.random.normal(jax.random.PRNGKey(0), (6, 16, 24)),
        "w2": jax.random.normal(jax.random.PRNGKey(1), (6, 24, 16)),
    }

    def spec_fn(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        return specs[name]

    ref_tx = scale_by_muon(mesh=None)
    tx = scale_by_muon(mesh=mesh, shard_axis=("data", "model"),
                       param_spec_fn=spec_fn)
    ref_up, _ = ref_tx.update(grads, ref_tx.init(params), params)

    shardings = {k: NamedSharding(mesh, s) for k, s in specs.items()}
    grads_sh = jax.tree_util.tree_map(jax.device_put, grads, shardings)
    params_sh = jax.tree_util.tree_map(jax.device_put, params, shardings)

    with mesh:
        state = jax.jit(tx.init)(params_sh)
        step = jax.jit(lambda g, s, p: tx.update(g, s, p)[0])
        lowered = step.lower(grads_sh, state, params_sh)
        compiled = lowered.compile()
        up = compiled(grads_sh, state, params_sh)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(up[k]), np.asarray(ref_up[k]), rtol=2e-2, atol=2e-2,
            err_msg=f"update mismatch for {k}",
        )

    # HLO check: no all-gather may produce the FULL per-device stacked
    # array (6 or padded 8 x 16 x 24 f32/bf16) — shapes in SPMD HLO are
    # per-device local shapes.
    hlo = compiled.as_text()
    bad = [
        ln for ln in hlo.splitlines()
        if "all-gather" in ln and any(
            f"[{p},16,24]" in ln or f"[{p},24,16]" in ln
            or f"[{p},16,128]" in ln  # padded-lane variants
            for p in (6, 8)
        )
    ]
    assert not bad, "full-stack all-gather found in HLO:\n" + "\n".join(bad)


def test_muon_bf16_momentum_tracks_fp32():
    """momentum_dtype=bfloat16 halves Muon's optimizer state (the 0.25°
    memory lever, PERF.md); the update trajectory must stay close to fp32
    momentum (NS normalizes its input, so momentum rounding barely moves
    the direction). Default None must keep fp32 state."""
    params = {"w": jax.random.normal(jax.random.PRNGKey(3), (32, 16))}
    grads = [
        {"w": jax.random.normal(jax.random.PRNGKey(10 + i), (32, 16)) * 0.1}
        for i in range(5)
    ]

    def run(momentum_dtype):
        opt = muon(0.02, momentum_dtype=momentum_dtype)
        state = opt.init(params)
        p = params
        for g in grads:
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p32, s32 = run(None)
    pb, sb = run(jnp.bfloat16)
    mom32 = jax.tree_util.tree_leaves(s32)[0]
    momb = jax.tree_util.tree_leaves(sb)[0]
    assert mom32.dtype == jnp.float32
    assert momb.dtype == jnp.bfloat16
    # trajectories agree to bf16-rounding accuracy after 5 steps
    np.testing.assert_allclose(
        np.asarray(pb["w"]), np.asarray(p32["w"]), atol=3e-2
    )
    # and the bf16 run still descends like the fp32 one on a quadratic
    _quadratic_descent(muon(0.05, momentum_dtype=jnp.bfloat16),
                       {"w": jnp.zeros((16, 16))})


def test_stochastic_round_bf16_unbiased_and_tracks_sub_ulp():
    """The bf16 momentum cast uses stochastic rounding (r3 ADVICE): a
    persistent update below half a bf16 ULP must still accumulate in
    expectation instead of freezing the buffer."""
    from swift_tpu.training.optimizers.muon import (
        _stochastic_round_bf16, scale_by_muon,
    )

    # unbiasedness: E[sr(x)] == x for values square in the rounding gap
    x = jnp.full((20000,), 1.0 + 2 ** -10, jnp.float32)  # midpoint-ish
    out = _stochastic_round_bf16(x, jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16
    err = float(jnp.mean(out.astype(jnp.float32))) - float(x[0])
    assert abs(err) < 2e-4, err  # deterministic rounding would give ~1e-3

    # freeze regime: momentum ~1.0, per-step increment (1-mom)*(g-m) ~2e-4
    # (far below the bf16 ULP 2^-8=3.9e-3 at 1.0). Deterministic rounding
    # freezes m forever; SR must drift toward g.
    mom = 0.95
    opt = scale_by_muon(momentum=mom, momentum_dtype=jnp.bfloat16)
    params = {"w": jnp.zeros((8, 128), jnp.float32)}
    state = opt.init(params)
    state = state._replace(momentum={"w": jnp.ones((8, 128), jnp.bfloat16)})
    g = {"w": jnp.full((8, 128), 1.004, jnp.float32)}
    for _ in range(200):
        _, state = opt.update(g, state, params)
    drift = float(jnp.mean(state.momentum["w"].astype(jnp.float32))) - 1.0
    # expectation after 200 steps: 0.004*(1-0.95^200) ~ 0.004
    assert drift > 0.002, f"bf16 momentum froze (drift={drift})"


def test_muon_fp32_state_layout_unchanged_by_sr_counter():
    """fp32-momentum MuonState must contribute the same checkpoint leaves
    as before the SR counter landed (count=() flattens to nothing)."""
    from swift_tpu.training.optimizers.muon import scale_by_muon

    params = {"w": jnp.zeros((4, 4))}
    s32 = scale_by_muon().init(params)
    assert len(jax.tree_util.tree_leaves(s32)) == 1
    sb = scale_by_muon(momentum_dtype=jnp.bfloat16).init(params)
    assert len(jax.tree_util.tree_leaves(sb)) == 2  # momentum + count
