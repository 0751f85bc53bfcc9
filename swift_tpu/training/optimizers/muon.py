"""Muon — MomentUm Orthogonalized by Newton-Schulz, as optax transforms.

Behavioral parity with the reference optimizer
(reference: src/swift/training/optimizers/muon.py):

  * quintic Newton-Schulz iteration run in bfloat16 (:5-35) — a perfect MXU
    workload (5 iterations × 3 matmuls on weight-shaped matrices);
  * ``muon_update``: Nesterov momentum → orthogonalize → aspect-ratio scale
    ``max(1, rows/cols)^0.5`` (:38-45), conv filters flattened to 2D (:41-42);
  * ``muon_with_aux_adam`` — Muon for hidden ≥2-D matrices, a hand-rolled
    bias-corrected Adam for everything else (:149-262), selected by a
    user-provided label function (the reference keys on
    ``ndim >= 2 and "transformer" in name``, train.py:296-311).

TPU-first difference: the reference shards NS work round-robin over ranks
and all_gathers updated params (:88-110). Under pjit with replicated
parameters XLA computes each NS once per device; the update is one fused
program, no collectives needed. (A shard_map'd variant that splits NS work
over the mesh axis is a later optimization — see PLAN in docs.)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def newton_schulz(G: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization in bfloat16.

    Accepts (..., m, n); operates on the trailing two dims; transposes so the
    iteration runs on the short side (reference muon.py:5-35).
    """
    assert G.ndim >= 2
    a, b, c = (3.4445, -4.7750, 2.0315)
    X = G.astype(jnp.bfloat16)
    transposed = G.shape[-2] > G.shape[-1]
    if transposed:
        X = X.swapaxes(-1, -2)

    norm = jnp.sqrt(
        jnp.sum(X.astype(jnp.float32) ** 2, axis=(-2, -1), keepdims=True)
    ).astype(jnp.bfloat16)
    X = X / (norm + 1e-7)
    for _ in range(steps):
        A = jnp.matmul(X, X.swapaxes(-1, -2), preferred_element_type=jnp.bfloat16)
        B = b * A + c * jnp.matmul(A, A, preferred_element_type=jnp.bfloat16)
        X = a * X + jnp.matmul(B, X, preferred_element_type=jnp.bfloat16)

    if transposed:
        X = X.swapaxes(-1, -2)
    return X


def _orthogonalized_update(g: jnp.ndarray, ns_steps: int) -> jnp.ndarray:
    """Orthogonalize + aspect rescale (reference muon.py:38-45).

    2-D: plain NS. 3-D: treated as a stack of matrices (scan-over-layers
    parameters) — batched NS over the trailing two dims, which is exactly
    the reference's per-layer update done as one MXU batch. 4-D (conv
    OIHW-style filters) flattens trailing dims like the reference (:41-42).
    """
    shape = g.shape
    if g.ndim == 4:
        g2 = g.reshape(shape[0], -1)
    else:
        g2 = g
    u = newton_schulz(g2, steps=ns_steps)
    u = u * max(1.0, g2.shape[-2] / g2.shape[-1]) ** 0.5
    return u.reshape(shape).astype(jnp.float32)


class MuonState(NamedTuple):
    momentum: Any
    # Stochastic-rounding step counter: a jnp int32 scalar when the momentum
    # is stored in bfloat16, the empty tuple otherwise. An empty tuple
    # contributes NO pytree leaves, so fp32-momentum checkpoints keep their
    # exact leaf layout (utils/checkpoint.py flattens by path).
    count: Any = ()


def _stochastic_round_bf16(x32: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """fp32 -> bf16 with stochastic rounding: add uniform noise to the 16
    discarded mantissa bits, then truncate. Unbiased: E[round(x)] == x, so a
    persistent update smaller than half a bf16 ULP (~2^-9 relative) still
    moves the buffer in expectation instead of freezing (r3 ADVICE:
    deterministic round-to-nearest stalls the EMA once
    |(1-momentum)*(g-m)| < ~2^-9*|m|)."""
    bits = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    noise = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
        jnp.bfloat16
    )


def _sharded_orthogonalize(u: jnp.ndarray, ns_steps: int, mesh, axis):
    """Partition a stacked (P, m, n) Newton-Schulz over one or more mesh
    axes — the mesh-native analogue of the reference's round-robin rank
    sharding + all_gather (muon.py:88-110): each device orthogonalizes its
    slice of the layer stack; the out_spec all_gathers the results. With a
    (data, model) mesh the stack shards over the FLATTENED device set, so
    tp devices contribute NS work too instead of replicating it.

    The reshards are staged EXPLICITLY (replicate -> slice into the
    shard_map -> replicate): a momentum tensor arriving with a TP sharding
    (feature dims over ``model``) cannot transition to a stack-dim sharding
    directly — XLA's SPMD partitioner falls back to involuntary full
    rematerialization. replicate->slice and gather->replicate are standard
    collectives; NS must see full (m, n) matrices either way.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = (axis,) if isinstance(axis, str) else tuple(axis)
    n_dev = 1
    for a in axis:
        n_dev *= mesh.shape[a]
    P0 = u.shape[0]
    rep = NamedSharding(mesh, P())
    u = jax.lax.with_sharding_constraint(u, rep)
    pad = (-P0) % n_dev
    if pad:
        u = jnp.concatenate([u, jnp.zeros((pad, *u.shape[1:]), u.dtype)], 0)

    fn = shard_map(
        lambda x: _orthogonalized_update(x, ns_steps),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    )
    out = jax.lax.with_sharding_constraint(fn(u), rep)
    return out[:P0] if pad else out


def _tp_sharded_orthogonalize(
    u: jnp.ndarray, ns_steps: int, mesh, data_axes, model_axis: str,
    feat_dim: int,
):
    """TP-aware NS work sharding for a stacked (P, m, n) momentum whose
    feature dim ``feat_dim`` is sharded over ``model_axis``.

    Instead of replicating the TP-sharded momentum every step (a full
    all-gather of every stacked matrix — r2 VERDICT weak #4), the feature
    shards are exchanged for stack shards with ONE all_to_all inside the
    shard_map, NS runs on full (m, n) matrices with the stack split over
    data x model, and a second all_to_all restores the parameter's natural
    feature sharding. Per-device communication drops from the full stack to
    ~1/devices of it.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axes = tuple(data_axes)
    Dd = 1
    for a in data_axes:
        Dd *= mesh.shape[a]
    Tm = mesh.shape[model_axis]
    P0 = u.shape[0]
    pad = (-P0) % (Dd * Tm)
    if pad:
        u = jnp.concatenate([u, jnp.zeros((pad, *u.shape[1:]), u.dtype)], 0)

    entries = [None] * u.ndim
    if data_axes:
        entries[0] = data_axes if len(data_axes) > 1 else data_axes[0]
    entries[feat_dim] = model_axis
    io_spec = P(*entries)

    def fn(x):
        # (Ppad/Dd, ..., n/Tm) -> exchange stack chunks for feature chunks
        x = jax.lax.all_to_all(
            x, model_axis, split_axis=0, concat_axis=feat_dim, tiled=True
        )
        x = _orthogonalized_update(x, ns_steps)
        return jax.lax.all_to_all(
            x, model_axis, split_axis=feat_dim, concat_axis=0, tiled=True
        )

    out = shard_map(fn, mesh=mesh, in_specs=io_spec, out_specs=io_spec)(u)
    # hand the update back in the parameter's natural sharding (stack
    # unsharded, feature over model) so apply_updates needs no reshard.
    nat = [None] * u.ndim
    nat[feat_dim] = model_axis
    out = jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(*nat))
    )
    return out[:P0] if pad else out


def scale_by_muon(
    momentum: float = 0.95,
    ns_steps: int = 5,
    nesterov: bool = True,
    mesh=None,
    shard_axis = ("data", "model"),
    param_spec_fn=None,
    momentum_dtype=None,
) -> optax.GradientTransformation:
    """Raw Muon direction: momentum + Newton-Schulz orthogonalization.

    With ``mesh``, stacked (scan-over-layers) parameters have their NS work
    sharded across ``shard_axis`` instead of being computed redundantly on
    every device. ``param_spec_fn(path, leaf) -> PartitionSpec`` (e.g.
    ``swift_tpu.parallel.sharding._spec_for``) marks TP feature shardings:
    those params take the all_to_all path that never fully replicates the
    momentum (see _tp_sharded_orthogonalize).

    ``momentum_dtype`` (e.g. jnp.bfloat16) stores the momentum buffer in a
    reduced dtype — the EMA blend still computes in fp32, and the cast back
    to bfloat16 uses STOCHASTIC rounding (``_stochastic_round_bf16``) so the
    buffer keeps tracking gradients whose per-step increment is below a bf16
    ULP (deterministic rounding would freeze it once
    ``|(1-momentum)*(g-m)| < ~2^-9*|m|``). Newton-Schulz already runs in
    bf16 and normalizes its input, so the direction is insensitive to the
    rounding noise; this halves Muon's optimizer state (~0.5 GB for the
    0.25° flagship, PERF.md memory ledger). Off (None = param dtype) by
    default for exact parity with the reference trajectory.
    """

    use_sr = momentum_dtype is not None and jnp.dtype(momentum_dtype) == jnp.bfloat16

    def init_fn(params):
        def zeros(p):
            return jnp.zeros(p.shape, momentum_dtype or p.dtype)

        return MuonState(
            momentum=jax.tree_util.tree_map(zeros, params),
            count=jnp.zeros((), jnp.int32) if use_sr else (),
        )

    def _ortho(path, u):
        if u.ndim < 2:
            return u
        if mesh is not None and u.ndim == 3:
            axes = (
                (shard_axis,) if isinstance(shard_axis, str) else tuple(shard_axis)
            )
            axes = tuple(a for a in axes if a in mesh.axis_names)
            n_dev = 1
            for a in axes:
                n_dev *= mesh.shape[a]
            if axes and n_dev > 1:
                spec = param_spec_fn(path, u) if param_spec_fn else None
                if spec is not None:
                    for dim, entry in enumerate(tuple(spec)):
                        if (
                            dim > 0
                            and isinstance(entry, str)
                            and entry in axes
                            and mesh.shape[entry] > 1
                            and u.shape[dim] % mesh.shape[entry] == 0
                        ):
                            data_axes = tuple(a for a in axes if a != entry)
                            return _tp_sharded_orthogonalize(
                                u, ns_steps, mesh, data_axes, entry, dim
                            )
                return _sharded_orthogonalize(u, ns_steps, mesh, axes)
        return _orthogonalized_update(u, ns_steps)

    def update_fn(updates, state, params=None):
        def blend(m, g):
            return m.astype(jnp.float32) + (1 - momentum) * (
                g.astype(jnp.float32) - m.astype(jnp.float32)
            )

        if use_sr:
            # bf16 buffer: stochastically round the fp32 blend so sub-ULP
            # updates accumulate in expectation (see _stochastic_round_bf16).
            count = state.count + 1
            base = jax.random.fold_in(jax.random.PRNGKey(0x5357), count)
            m_leaves, treedef = jax.tree_util.tree_flatten(state.momentum)
            g_leaves = treedef.flatten_up_to(updates)
            new_leaves = [
                _stochastic_round_bf16(
                    blend(m, g), jax.random.fold_in(base, i)
                )
                for i, (m, g) in enumerate(zip(m_leaves, g_leaves))
            ]
            new_momentum = jax.tree_util.tree_unflatten(treedef, new_leaves)
        else:
            count = state.count
            new_momentum = jax.tree_util.tree_map(
                lambda m, g: blend(m, g).astype(m.dtype),
                state.momentum, updates,
            )
        if nesterov:
            blended = jax.tree_util.tree_map(
                lambda g, m: g + momentum * (m.astype(g.dtype) - g),
                updates, new_momentum,
            )
        else:
            blended = jax.tree_util.tree_map(
                lambda g, m: m.astype(g.dtype), updates, new_momentum
            )
        ortho = jax.tree_util.tree_map_with_path(_ortho, blended)
        return ortho, MuonState(momentum=new_momentum, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def muon(
    learning_rate: optax.ScalarOrSchedule = 0.02,
    momentum: float = 0.95,
    ns_steps: int = 5,
    nesterov: bool = True,
    weight_decay: float = 0.0,
    mesh=None,
    shard_axis = ("data", "model"),
    param_spec_fn=None,
    momentum_dtype=None,
) -> optax.GradientTransformation:
    """Standalone Muon with AdamW-style decoupled weight decay."""
    return optax.chain(
        scale_by_muon(momentum, ns_steps, nesterov, mesh, shard_axis,
                      param_spec_fn, momentum_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def _aux_adam(
    learning_rate: optax.ScalarOrSchedule,
    betas: tuple[float, float],
    eps: float,
    weight_decay: float,
) -> optax.GradientTransformation:
    """Bias-corrected Adam matching the reference's hand-rolled variant
    (muon.py:149-154): update = m̂ / (sqrt(v̂) + eps); note eps is added
    AFTER the bias correction of v, unlike optax.adam's eps placement."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": zeros, "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        count = state["count"] + 1
        b1, b2 = betas
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (1 - b1) * (g - m), state["mu"], updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (1 - b2) * (g * g - v), state["nu"], updates
        )
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        return out, {"mu": mu, "nu": nu, "count": count}

    return optax.chain(
        optax.GradientTransformation(init_fn, update_fn),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def muon_with_aux_adam(
    param_labels: Callable[[Any], Any],
    lr: optax.ScalarOrSchedule = 0.02,
    weight_decay: float = 0.01,
    momentum: float = 0.95,
    ns_steps: int = 5,
    adam_lr: optax.ScalarOrSchedule = 3e-4,
    adam_betas: tuple[float, float] = (0.9, 0.95),
    adam_weight_decay: float = 0.01,
    adam_eps: float = 1e-10,
    mesh=None,
    shard_axis = ("data", "model"),
    param_spec_fn=None,
    momentum_dtype=None,
) -> optax.GradientTransformation:
    """Combined Muon + aux Adam (reference muon.py:157-262).

    ``param_labels(params)`` returns a pytree of "muon"/"adam" labels; the
    canonical labeler for SwinV2 lives in ``swift_tpu.training.trainer``
    (matches reference train.py:296-311). With ``mesh``, Newton-Schulz work
    on stacked layer parameters is sharded over ``shard_axis`` (a name or
    tuple of names; axes missing from the mesh are ignored, so the default
    ("data", "model") uses every device of a dp x tp mesh).
    """
    return optax.multi_transform(
        {
            "muon": muon(lr, momentum, ns_steps, True, weight_decay,
                         mesh, shard_axis, param_spec_fn, momentum_dtype),
            "adam": _aux_adam(adam_lr, adam_betas, adam_eps, adam_weight_decay),
        },
        param_labels,
    )
