"""Pipeline-parallel prediction (parallel/pipeline.py).

The reference stubbed PP ("## TODO: PP Prediction", generating/
diffusion.py:25,65-71); these tests prove the collective-pipelining
implementation computes exactly the single-device forward, on the
8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from swift_tpu.models.swinv2 import SwinV2
from swift_tpu.parallel.pipeline import pipelined_swinv2_forward


def _tiny_model(depth, **kw):
    cfg = dict(
        img_resolution=(16, 32),
        in_channels=8,
        out_channels=5,
        window_size=(4, 4),
        shift_size=(2, 2),
        patch_size=(2, 2),
        depth=depth,
        dim=32,
        heads=4,
        auxiliary_dim=1,
        dtype=jnp.float32,
        use_pallas=False,
        remat_layers=False,
    )
    cfg.update(kw)
    return SwinV2(**cfg)


def _init(model, B, rng):
    x = jnp.asarray(rng.normal(size=(B, 16, 32, 8)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 1.4, size=(B,)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, t, aux)
    return variables, x, t, aux


def test_stage_split_matches_full_forward(rng):
    """embed -> pairs -> head == the one-shot forward (same params)."""
    model = _tiny_model(depth=4)
    variables, x, t, aux = _init(model, B=3, rng=rng)

    y_full = model.apply(variables, x, t, aux)
    h, cond = model.apply(variables, x, t, aux, stage="embed")
    h = model.apply(variables, h, cond, stage="pairs")
    y_staged = model.apply(variables, h, cond, stage="head")
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_staged),
                               rtol=0, atol=0)


def test_stage_pairs_slice_composes(rng):
    """Running the pair stack as two half-stack slices (cloned depth)
    matches the full stack — the per-stage computation of the pipeline."""
    model = _tiny_model(depth=4)
    variables, x, t, aux = _init(model, B=2, rng=rng)
    pairs = variables["params"]["pairs"]

    h, cond = model.apply(variables, x, t, aux, stage="embed")
    h_ref = model.apply(variables, h, cond, stage="pairs")

    half = model.clone(depth=2)
    lo = jax.tree_util.tree_map(lambda a: a[:1], pairs)
    hi = jax.tree_util.tree_map(lambda a: a[1:], pairs)
    h2 = half.apply({"params": {"pairs": lo}}, h, cond, stage="pairs")
    h2 = half.apply({"params": {"pairs": hi}}, h2, cond, stage="pairs")
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h2),
                               rtol=0, atol=0)


@pytest.mark.parametrize(
    "depth,stages,n_micro,batch",
    [
        (4, 2, 2, 4),   # S == M
        (4, 2, 4, 4),   # more microbatches than stages (smaller bubble)
        (8, 4, 3, 6),   # deeper stack, M != S, M not dividing S
    ],
)
def test_pipelined_forward_matches_single_device(rng, depth, stages,
                                                 n_micro, batch):
    model = _tiny_model(depth=depth)
    variables, x, t, aux = _init(model, B=batch, rng=rng)
    y_ref = model.apply(variables, x, t, aux)

    mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
    y_pp = pipelined_swinv2_forward(
        model, variables, x, t, aux, mesh=mesh, n_micro=n_micro
    )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pp),
                               rtol=1e-6, atol=1e-6)


def test_pipelined_forward_jits_and_no_aux(rng):
    """jit-wrapped pipeline (params as arguments), auxiliary=None path."""
    model = _tiny_model(depth=4, auxiliary_dim=0)
    x = jnp.asarray(rng.normal(size=(4, 16, 32, 8)).astype(np.float32))
    t = jnp.float32(0.7)  # scalar t broadcast
    variables = model.init(jax.random.PRNGKey(1), x, t)
    y_ref = model.apply(variables, x, t)

    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))

    @jax.jit
    def run(v, x):
        return pipelined_swinv2_forward(model, v, x, t, mesh=mesh, n_micro=2)

    y_pp = run(variables, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pp),
                               rtol=1e-6, atol=1e-6)


def test_pipelined_forward_validates_split(rng):
    model = _tiny_model(depth=4)
    variables, x, t, aux = _init(model, B=4, rng=rng)
    mesh3 = Mesh(np.array(jax.devices()[:3]), ("pipe",))
    with pytest.raises(ValueError, match="block pairs"):
        pipelined_swinv2_forward(model, variables, x, t, aux, mesh=mesh3)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    with pytest.raises(ValueError, match="microbatches"):
        pipelined_swinv2_forward(model, variables, x, t, aux, mesh=mesh2,
                                 n_micro=3)
    for bad in (0, -2):
        with pytest.raises(ValueError, match="n_micro"):
            pipelined_swinv2_forward(model, variables, x, t, aux, mesh=mesh2,
                                     n_micro=bad)


def test_pipelined_forward_grads_match(rng):
    """The pipeline is differentiable: d(loss)/d(params) through the
    shard_map'd ppermute schedule equals the single-device gradients —
    stage-sharded pair grads stay per-stage, replicated embed/head grads
    psum correctly (only stage 0 / stage S-1 contribute). This is what
    makes the executor usable for pipeline-parallel TRAINING, not just
    prediction."""
    model = _tiny_model(depth=4)
    variables, x, t, aux = _init(model, B=4, rng=rng)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))

    def loss_direct(v):
        return jnp.mean(model.apply(v, x, t, aux) ** 2)

    def loss_pp(v):
        y = pipelined_swinv2_forward(model, v, x, t, aux, mesh=mesh,
                                     n_micro=2)
        return jnp.mean(y ** 2)

    g_ref = jax.grad(loss_direct)(variables)
    g_pp = jax.grad(loss_pp)(variables)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf in flat_ref:
        got = np.asarray(flat_pp[path])
        np.testing.assert_allclose(
            got, np.asarray(leaf), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipelined_dp_composition(rng):
    """dp x pp on one mesh: microbatches sharded over `data`, the pair
    stack pipelined over `pipe` — forward AND gradients match the
    single-device run (production meshes combine axes)."""
    model = _tiny_model(depth=4)
    variables, x, t, aux = _init(model, B=8, rng=rng)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("pipe", "data"))

    y_ref = model.apply(variables, x, t, aux)
    y_pp = pipelined_swinv2_forward(
        model, variables, x, t, aux, mesh=mesh, n_micro=2, data_axis="data"
    )
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pp),
                               rtol=1e-6, atol=1e-6)

    def loss_direct(v):
        return jnp.mean(model.apply(v, x, t, aux) ** 2)

    def loss_pp(v):
        y = pipelined_swinv2_forward(model, v, x, t, aux, mesh=mesh,
                                     n_micro=2, data_axis="data")
        return jnp.mean(y ** 2)

    g_ref = jax.grad(loss_direct)(variables)
    g_pp = jax.grad(loss_pp)(variables)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pp),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
