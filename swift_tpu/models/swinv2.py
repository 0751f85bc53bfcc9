"""SwinV2 windowed-attention transformer — the flagship backbone.

Re-designed TPU-first from the behavior of the reference SwinV2
(reference: src/swift/models/swinv2.py:254-330):

  * channels-last NHWC layout, batch kept separate from the window axis so
    per-sample conditioning broadcasts over windows (no repeat_interleave,
    reference swinv2.py:181-184);
  * cosine attention (L2-normalized q,k with a learned per-head logit scale
    clamped at log(100), reference swinv2.py:116-127) with fp32 softmax and
    bf16 MXU matmuls;
  * SwiGLU feed-forward with hidden = int(8/3 · dim) (reference :160);
  * post-norm residual blocks with AdaLN modulation (ModulatedNorm,
    reference :77-86, :211-212);
  * sinusoidal timestep embedding with the EDM sin/cos flip (reference
    :44-60) scaled by ``timestep_weight``;
  * zero-init for modulation and output-head weights (reference :295-303).

Everything is a pure function of the parameter pytree; the optional
``jvp`` flag selects an attention path guaranteed to have a forward-mode
AD rule (used by the sCM loss through ``jax.jvp``).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from swift_tpu.ops.embeddings import timestep_embedding
from swift_tpu.ops.windows import cyclic_shift, window_partition, window_reverse

Dtype = Any

_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)
_ZEROS = nn.initializers.zeros_init()


def _wsc(x, mesh, *entries):
    """GSPMD activation hint: ``with_sharding_constraint`` when a mesh is
    configured on the model (tensor parallelism). Without hints XLA falls
    back to involuntary full rematerialization on the window reshapes under
    a (data, model) mesh (round-1 MULTICHIP tail). Entries longer than the
    rank are trimmed from the right."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    # drop entries whose dim doesn't divide the mesh axis (e.g. the B=1
    # forward inside precond.init, or odd tails) — replicate those dims.
    spec = tuple(
        e
        if e is not None
        and e in mesh.axis_names
        and x.shape[i] % mesh.shape[e] == 0
        else None
        for i, e in enumerate(entries[: x.ndim])
    )
    if all(e is None for e in spec):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def _jvp_big_grid(x) -> bool:
    """Route a jvp-flagged forward to the fused pallas kernels?

    Flagship-sized and larger grids (≥8192 tokens — the 1.4° grid is
    exactly 8192) take the fused kernels: with the COMBINED primal+tangent
    FFN kernel (gate/up shared in VMEM) the fused pair MEASURED 717.4 ms vs
    751.5 ms for the jnp jvp forward at B=16 (r4,
    scripts/probe_jvp_variants.py) — and at 0.25° the jnp path's
    (tokens, 2·hidden) fp32 HBM intermediates are a 6-12 GB memory cliff.
    The gate is SHARED between FeedForward and ModulatedNorm because each
    kernel alone measured SLOWER than jnp (839/812 ms — breaking XLA's
    primal/tangent CSE without removing the HBM round-trips); only the pair
    wins. Genuinely small grids (tests) keep the jnp path. Threshold
    env-overridable for A/B probes."""
    if x is None:
        return False
    tokens = 1
    for s in x.shape[1:-1]:
        tokens *= s
    return tokens >= int(os.environ.get("SWIFT_JVP_FUSED_MIN_TOKENS", "8192"))


def _broadcast_t(t, B: int) -> jnp.ndarray:
    """Normalize a timestep input — () / (1,) / (B,) — to fp32 (B,).
    Shared by SwinV2.__call__ and the pipeline executor so the accepted
    forms can't diverge."""
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.broadcast_to(t[None], (B,))
    elif t.shape[0] == 1 and B > 1:
        t = jnp.broadcast_to(t.reshape(1), (B,))
    return t


def _as_2tuple(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    v = tuple(int(i) for i in v)
    assert len(v) == 2
    return v


class _AffineParams(nn.Module):
    """LayerNorm affine params at the nn.LayerNorm paths (scale, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.dim,)),
            self.param("bias", nn.initializers.zeros_init(), (self.dim,)),
        )


class ModulatedNorm(nn.Module):
    """LayerNorm + AdaLN scale/shift from the conditioning vector, with the
    post-norm residual add folded in.

    Matches reference swinv2.py:77-86 (used post-norm, :101,:138; the
    residual adds are :211-212). Statistics in fp32; output in the residual
    (or compute) dtype. On TPU with ``residual`` given, the whole epilogue
    runs as one fused Pallas pass (ops.pallas_modnorm) — one read of x and
    residual, one write, instead of three XLA passes per site.
    """

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None
    mesh: Any = None
    data_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        t: jnp.ndarray,
        residual: Optional[jnp.ndarray] = None,
        jvp: bool = False,
        pieces: bool = False,
    ):
        from swift_tpu.ops.pallas_modnorm import (
            reference_modnorm_residual,
            sharded_modnorm_residual,
        )

        g, b = _AffineParams(self.dim, name="norm")()
        mod = nn.Dense(
            2 * self.dim,
            kernel_init=_ZEROS,
            bias_init=_ZEROS,
            dtype=self.dtype,
            name="modulation",
        )(t)
        scale, shift = jnp.split(mod, 2, axis=-1)  # (B, D) each
        if pieces:
            # raw (ln_scale, ln_bias, mod_scale, mod_shift) for a producer
            # kernel that fuses the whole epilogue (x is ignored).
            return g, b, scale, shift

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        # jvp routing shared with FeedForward — see _jvp_big_grid.
        if use_pallas and residual is not None and (not jvp or _jvp_big_grid(x)):
            try:
                return sharded_modnorm_residual(
                    x, residual, g, b, scale, shift, self.eps,
                    mesh=self.mesh, data_axis=self.data_axis, jvp=jvp,
                )
            except ValueError:
                pass
        return reference_modnorm_residual(
            x, residual, g, b, scale, shift, self.eps
        )


class _KernelParam(nn.Module):
    """A bare Dense kernel parameter at the path ``<name>/kernel`` —
    layout-identical to bias-free ``nn.Dense`` params, but returned as an
    array so fused kernels can consume it directly."""

    shape: tuple[int, int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", _TRUNC02, self.shape)


class FeedForward(nn.Module):
    """SwiGLU feed-forward, post-norm (reference swinv2.py:89-102).

    On TPU (and jvp=False, no TP mesh) the gate/up/down matmul chain runs
    as one fused Pallas kernel (swift_tpu.ops.pallas_ffn) — the
    (tokens, 2·hidden) intermediate never reaches HBM."""

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.bfloat16
    mesh: Any = None
    data_axis: Optional[str] = None
    model_axis: Optional[str] = None
    use_pallas: Optional[bool] = None
    quant: Optional[str] = None  # "int8": dynamic-quant inference matmuls

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, jvp: bool = False
    ) -> jnp.ndarray:
        inputs = x
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        # kernels declared under the same param paths nn.Dense would use
        # (w1/kernel, w2/kernel) so checkpoints and sharding rules are
        # unchanged; having them in hand lets the fused kernel consume them.
        k1 = _KernelParam((x.shape[-1], 2 * self.hidden_dim), name="w1")()
        k2 = _KernelParam((self.hidden_dim, self.dim), name="w2")()

        norm = ModulatedNorm(
            self.dim, dtype=self.dtype, name="norm",
            use_pallas=self.use_pallas, mesh=self.mesh,
            data_axis=self.data_axis,
        )
        if self.quant == "int8" and not jvp:
            # inference-only dynamic int8 (PERF.md lever (e)); accuracy
            # gated by tests/test_quant.py. No vjp/jvp rules by design.
            from swift_tpu.ops.pallas_ffn import (
                fused_swiglu_ffn_int8,
                reference_swiglu_ffn_int8,
            )

            if use_pallas and self.mesh is None:
                try:
                    y = fused_swiglu_ffn_int8(x.astype(self.dtype), k1, k2)
                    return norm(y, t, residual=inputs, jvp=jvp)
                except ValueError:  # token count doesn't tile
                    pass
            y = reference_swiglu_ffn_int8(x.astype(self.dtype), k1, k2)
            return norm(y.astype(self.dtype), t, residual=inputs, jvp=jvp)
        # jvp routing shared with ModulatedNorm — see _jvp_big_grid (speed
        # vs the 0.25° memory cliff).
        fused = use_pallas and self.mesh is None and (not jvp or _jvp_big_grid(x))
        if fused:
            # FFN matmul chain fused; the norm+residual epilogue stays a
            # separate pallas pass — folding it INTO this kernel measured
            # slower (the VPU epilogue serializes against the MXU matmuls
            # within one program; standalone it overlaps the next block).
            from swift_tpu.ops.pallas_ffn import fused_swiglu_ffn

            try:
                y = fused_swiglu_ffn(x.astype(self.dtype), k1, k2, jvp=jvp)
                return norm(y, t, residual=inputs, jvp=jvp)
            except ValueError:  # token count doesn't tile -> jnp path
                pass
        gate_up = jnp.dot(x.astype(self.dtype), k1.astype(self.dtype))
        # column-parallel w1: hidden features live on `model`; gate/up
        # are contiguous halves so the split keeps the same sharding.
        gate_up = _wsc(
            gate_up, self.mesh, self.data_axis, None, self.model_axis
        )
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = jnp.dot(jax.nn.silu(gate) * up, k2.astype(self.dtype))
        # row-parallel w2: XLA inserts the psum; output replicated.
        x = _wsc(x, self.mesh, self.data_axis, None, None)
        # post-norm + the block's residual add, fused (reference :212)
        return norm(x, t, residual=inputs, jvp=jvp)


class WindowAttention(nn.Module):
    """Cosine attention over shifted spatial windows, post-norm.

    Reference swinv2.py:105-139 (+ the cyclic shift / window partition of
    :186-208, which lives here so it can fuse into the kernel). Input is the
    spatial (B, gh, gw, D) activation. The softmax runs in fp32; the matmuls
    run in bf16 on the MXU with fp32 accumulation.

    Two TPU paths:
      * layout-native block kernel (ops.pallas_block_attention) when shapes
        allow: consumes the qkv projection output directly — shift, window
        partition, head split, cosine normalize, attention and the inverse
        layout all happen in one kernel (zero XLA layout passes);
      * per-head kernel / jnp fallback otherwise and for the sCM
        forward-mode-AD term — the same split the reference makes by
        disabling flash attention under jvp (swinv2.py:129).
    """

    dim: int
    heads: int
    head_dim: int
    window_size: tuple[int, int]
    shift: tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None  # None = auto (TPU only)
    mesh: Any = None
    data_axis: Optional[str] = None
    model_axis: Optional[str] = None
    quant: Optional[str] = None  # "int8": dynamic-quant qkv projection

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, jvp: bool = False
    ) -> jnp.ndarray:
        from swift_tpu.ops.pallas_attention import (
            fused_window_attention,
            reference_window_attention,
        )
        from swift_tpu.ops.pallas_block_attention import (
            block_attention_eligible,
            sharded_block_attention,
        )

        from swift_tpu.ops.pallas_block_attention import _padded_dim

        B, gh, gw, _ = x.shape
        wh, ww = self.window_size
        sh, sw = self.shift
        inner = self.heads * self.head_dim
        # raw kernel at the nn.Dense param path (to_qkv/kernel) so
        # checkpoints/sharding are unchanged; having the array in hand lets
        # the block-kernel path pad weight *columns* so the matmul emits the
        # lane-aligned layout directly (padding the activation instead costs
        # two full HBM passes per block — measured).
        k_qkv = _KernelParam((x.shape[-1], inner * 3), name="to_qkv")()

        # learned per-head log scale, init log(10), clamped at log(100)
        # (reference swinv2.py:116,125).
        logit_scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, math.log(10.0), jnp.float32),
            (self.heads,),
        )
        logit_scale = jnp.exp(jnp.clip(logit_scale, max=math.log(100.0)))

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        def _proj(xx, kk):
            # qkv projection; int8 dynamic-quant variant on the inference
            # path (2x MXU rate; the rescale chain fuses into the dot).
            if self.quant == "int8" and not jvp:
                from swift_tpu.ops.quant import int8_matmul

                return int8_matmul(xx, kk).astype(self.dtype)
            if use_pallas and self.mesh is None:
                # pallas-pinned matmul (ops/pallas_linear.py): holds the
                # qkv dot at kernel speed in the jvp-forward / remat'd-
                # backward fusion contexts too — measured -43 ms on the
                # hd128 train step (a bare 2D reshape measured NEUTRAL).
                from swift_tpu.ops.pallas_linear import fused_linear

                try:
                    return fused_linear(xx.astype(self.dtype), kk, jvp=jvp)
                except ValueError:
                    pass
            return jnp.dot(xx.astype(self.dtype), kk.astype(self.dtype))

        kind = None
        if use_pallas:
            if block_attention_eligible(
                (gh, gw), (wh, ww), (sh, sw), self.heads, inner
            ):
                kind = "block"
            elif self.mesh is None:
                from swift_tpu.ops.pallas_block_attention import (
                    tiled_block_attention_eligible,
                )

                if tiled_block_attention_eligible(
                    (gh, gw), (wh, ww), self.heads, inner
                ):
                    # grids too large for the whole-grid kernel (0.25°):
                    # window-tiled variant, shift via one XLA roll.
                    kind = "tiled"
        if kind:
            dp = _padded_dim(self.head_dim)
            kp = k_qkv.reshape(x.shape[-1], self.heads, 3, self.head_dim)
            if dp != self.head_dim:
                kp = jnp.pad(
                    kp, ((0, 0), (0, 0), (0, 0), (0, dp - self.head_dim))
                )
            kp = kp.reshape(x.shape[-1], self.heads * 3 * dp)
            # tiled path: apply the odd-block cyclic shift to the dim-wide
            # ACTIVATIONS before the projection rather than to the 3·inner-
            # wide qkv after it — a token permutation commutes with the
            # row-wise matmul (bit-exact), and the roll temporaries shrink
            # 3x (at 0.25° that is the difference between the single-chip
            # sCM step fitting and OOMing; PERF.md r5 ledger). The residual
            # keeps the unrolled x; the output is un-rolled below.
            pre_rolled = kind == "tiled" and (sh or sw)
            if pre_rolled:
                from swift_tpu.ops.pallas_block_attention import cyclic_roll2

                qkv = _proj(cyclic_roll2(x, sh, sw, jvp=jvp), kp)
            else:
                qkv = _proj(x, kp)
            # column-parallel qkv: features are heads-major chunks, so
            # sharding them over `model` IS the per-head split.
            qkv = _wsc(qkv, self.mesh, self.data_axis, None, None, self.model_axis)
            if kind == "block":
                out = sharded_block_attention(
                    qkv, logit_scale, self.heads, (wh, ww), (sh, sw),
                    mesh=self.mesh, data_axis=self.data_axis,
                    model_axis=self.model_axis, jvp=jvp,
                ).astype(self.dtype)
            else:
                from swift_tpu.ops.pallas_block_attention import (
                    cyclic_roll2,
                    fused_tiled_block_attention,
                )

                out = fused_tiled_block_attention(
                    qkv, logit_scale, self.heads, (wh, ww), (0, 0),
                    jvp=jvp,
                ).astype(self.dtype)
                if pre_rolled:
                    out = cyclic_roll2(out, -sh, -sw, jvp=jvp)
            # stay in the padded (heads·dp) layout: wo's rows get the same
            # zero padding, so the slice back to heads·d never materializes
            # (the attention kernel writes zeros in the pad lanes).
            padded_out = dp != self.head_dim
        else:
            padded_out = False
            qkv = _proj(x, k_qkv)
            qkv = _wsc(qkv, self.mesh, self.data_axis, None, None, self.model_axis)
            out = self._per_head_path(
                qkv, logit_scale, jvp,
                fused_window_attention if use_pallas
                else (lambda q, k, v, s, **kw: reference_window_attention(q, k, v, s)),
            )
        out = _wsc(out, self.mesh, self.data_axis, None, None, self.model_axis)

        k_wo = _KernelParam((inner, self.dim), name="wo")()
        if padded_out:
            dp = _padded_dim(self.head_dim)
            k_wo = jnp.pad(
                k_wo.reshape(self.heads, self.head_dim, self.dim),
                ((0, 0), (0, dp - self.head_dim), (0, 0)),
            ).reshape(self.heads * dp, self.dim)
        norm = ModulatedNorm(
            self.dim, dtype=self.dtype, name="norm",
            use_pallas=self.use_pallas, mesh=self.mesh,
            data_axis=self.data_axis,
        )
        if use_pallas and not jvp and self.mesh is None:
            # wo matmul + post-norm + residual in one kernel (the matmul
            # output never reaches HBM; reference :211). With quant="int8"
            # the projection rides the MXU's 2x int8 rate like qkv/FFN.
            from swift_tpu.ops.pallas_modnorm import (
                fused_matmul_modnorm_residual,
                fused_matmul_modnorm_residual_int8,
            )

            mm_mn = (
                fused_matmul_modnorm_residual_int8
                if self.quant == "int8"
                else fused_matmul_modnorm_residual
            )
            # NOTE: named mod_* to avoid shadowing the window-shift row `sh`
            # unpacked above (ADVICE r2).
            mod_g, mod_b, mod_scale, mod_shift = norm(None, t, pieces=True)
            try:
                return mm_mn(
                    out.astype(self.dtype), k_wo, x, mod_g, mod_b, mod_scale, mod_shift
                )
            except ValueError:
                pass
        if self.quant == "int8" and not jvp:
            # jnp mirror of the int8 epilogue's matmul (same quantization
            # points) — the CPU path for quant="int8".
            from swift_tpu.ops.quant import int8_matmul

            out = int8_matmul(out, k_wo).astype(self.dtype)
        else:
            out = jnp.dot(out.astype(self.dtype), k_wo.astype(self.dtype))
        # row-parallel wo: output replicated over model after XLA's psum.
        out = _wsc(out, self.mesh, self.data_axis, None, None, None)
        # post-norm + the block's residual add, fused (reference :211)
        return norm(out, t, residual=x, jvp=jvp)

    def _per_head_path(self, qkv, logit_scale, jvp, attn_fn):
        """Classic pipeline: XLA shift/partition/head-split around a
        (B·nW, h, n, d) attention core (per-head Pallas kernel or jnp)."""
        B, gh, gw, _ = qkv.shape
        wh, ww = self.window_size
        sh, sw = self.shift
        inner = self.heads * self.head_dim
        if sh or sw:
            qkv = cyclic_shift(qkv, (-sh, -sw))
        qkv = window_partition(qkv, (wh, ww))  # (B, nW, n, 3·inner)
        nW, n = qkv.shape[1], qkv.shape[2]
        qkv = qkv.reshape(B, nW, n, self.heads, 3 * self.head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # (B, nW, n, h, d) -> (B*nW, h, n, d)
        def to_heads(a):
            return a.transpose(0, 1, 3, 2, 4).reshape(
                B * nW, self.heads, n, self.head_dim
            )

        qh, kh, vh = (
            _wsc(to_heads(a), self.mesh, self.data_axis, self.model_axis)
            for a in (q, k, v)
        )
        out = attn_fn(
            qh, kh, vh, logit_scale, jvp=jvp, mesh=self.mesh,
            data_axis=self.data_axis, model_axis=self.model_axis,
        )
        out = (
            out.reshape(B, nW, self.heads, n, self.head_dim)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, nW, n, inner)
            .astype(self.dtype)
        )
        out = window_reverse(out, (wh, ww), (gh, gw))
        if sh or sw:
            out = cyclic_shift(out, (sh, sw))
        return out


class SwinBlock(nn.Module):
    """One (attention, feed-forward) pair with optional cyclic shift."""

    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: tuple[int, int]
    grid_size: tuple[int, int]
    shift: tuple[int, int]  # (0, 0) on even layers
    dtype: Dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None
    mesh: Any = None
    data_axis: Optional[str] = None
    model_axis: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, jvp: bool = False):
        gh, gw = self.grid_size
        B, N, D = x.shape
        tp = dict(mesh=self.mesh, data_axis=self.data_axis,
                  model_axis=self.model_axis)

        # (B, N, D) -> (B, gh, gw, D) is a free view; shift/partition live
        # inside WindowAttention so they can fuse into the block kernel,
        # and both residual adds are folded into the post-norms.
        x = WindowAttention(
            self.dim, self.heads, self.head_dim,
            window_size=self.window_size, shift=self.shift,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn",
            quant=self.quant, **tp,
        )(x.reshape(B, gh, gw, D), t, jvp)
        x = x.reshape(B, N, D)

        x = _wsc(x, self.mesh, self.data_axis, None, None)
        x = FeedForward(
            self.dim, self.mlp_dim, dtype=self.dtype, name="ff",
            use_pallas=self.use_pallas, quant=self.quant, **tp,
        )(x, t, jvp)
        return x


class SwinBlockPair(nn.Module):
    """One (unshifted, shifted) block pair — the scan-over-layers body.

    Stacking identical pairs under ``nn.scan`` compiles the transformer once
    per PAIR instead of once per layer: 6x less HLO for the flagship
    depth-12 model (faster compiles, same math — layer weights become a
    stacked leading axis in the param tree).
    """

    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: tuple[int, int]
    grid_size: tuple[int, int]
    shift: tuple[int, int]
    jvp: bool
    dtype: Dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None
    mesh: Any = None
    data_axis: Optional[str] = None
    model_axis: Optional[str] = None
    quant: Optional[str] = None
    # nested per-BLOCK remat inside the (already pair-remat'd) scan body:
    # halves the backward recompute window at the cost of ~one extra
    # forward — needed to fit the 0.25° grid on a 16 GB chip.
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, cond):
        common = dict(
            dim=self.dim, heads=self.heads, head_dim=self.head_dim,
            mlp_dim=self.mlp_dim, window_size=self.window_size,
            grid_size=self.grid_size, dtype=self.dtype,
            use_pallas=self.use_pallas, mesh=self.mesh,
            data_axis=self.data_axis, model_axis=self.model_axis,
            quant=self.quant,
        )
        Block = (
            # static_argnums counts self: (x=1, cond=2, jvp=3) — the jvp
            # bool must stay static or every `if jvp` branch downstream
            # sees a tracer.
            nn.remat(SwinBlock, prevent_cse=False, static_argnums=(3,))
            if self.remat_blocks and not self.jvp
            else SwinBlock
        )
        x = Block(shift=(0, 0), name="even", **common)(x, cond, self.jvp)
        x = Block(shift=self.shift, name="odd", **common)(x, cond, self.jvp)
        return x, None


class SwinV2(nn.Module):
    """Flagship SwinV2 denoiser backbone.

    Call signature (functional, via ``.apply``):
      x: (B, H, W, in_channels) NHWC
      t: () or (B,) timesteps
      auxiliary: optional (B, auxiliary_dim)
      jvp: choose the forward-mode-differentiable attention path
      return_logvar: also return the per-sample logvar head output (B,)

    ``scan_layers=True`` (default for even depths) runs the block stack as
    ``nn.scan`` over stacked block-pair parameters — identical math, much
    smaller compiled program (TPU-first; see SwinBlockPair).
    """

    img_resolution: Sequence[int]
    in_channels: int
    out_channels: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    patch_size: Sequence[int]
    depth: int = 6
    dim: int = 512
    heads: int = 12
    # Decouple attention width from model width (heads*head_dim need not
    # equal dim). None (default) ties head_dim = dim // heads like the
    # reference (flagship: 1056/12 = 88, which the Pallas kernel must
    # zero-pad to 128 — a +45% qkv-matmul tax, PERF.md). head_dim=128
    # (e.g. with heads=8) removes the pad for NEW training runs; it is
    # parity-breaking with reference checkpoints, so it is opt-in.
    head_dim: Optional[int] = None
    # "learned" (default): one (1, gh*gw, dim) table like the reference
    # (swinv2.py:278). "factorized": row (gh, dim) + column (gw, dim) tables
    # whose broadcast sum replaces it — O(gh+gw) instead of O(gh*gw) params.
    # At 0.25° the learned table is 280M params (1.12 GB fp32) plus 2.24 GB
    # of Adam moments; the factorized form is 1.15M params and is the memory
    # lever that lets single-chip 0.25° training fit (PERF.md). Parity-
    # breaking with reference checkpoints, so opt-in.
    pos_embed_mode: str = "learned"
    auxiliary_dim: int = 0
    logvar: bool = False
    timestep_weight: float = 1.0
    dtype: Dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None  # None = auto (pallas on TPU only)
    # "int8": dynamically-quantized qkv + FFN matmuls on the inference path
    # (jvp=False). The v5e MXU runs int8 at 2x bf16 rate; accuracy is
    # forecast-gated (tests/test_quant.py) and the flag is opt-in —
    # training/jvp paths always stay bf16/fp32. PERF.md lever (e).
    quant: Optional[str] = None
    scan_layers: bool = True  # nn.scan over block pairs (even depth only)
    # rematerialize each block pair in the backward pass: the flagship sCM
    # step at a realistic batch keeps ~46 GB of activations without it (a
    # v5e has 16 GB HBM). Saves only the 6 pair boundaries; inference and
    # forward-only jits are unaffected (checkpoint is identity in primal).
    remat_layers: bool = True
    # additionally remat each BLOCK inside the pair (nested checkpoint):
    # halves the backward recompute window for ~one extra forward of
    # compute. Required to fit 0.25° training on a 16 GB chip.
    remat_blocks: bool = False
    # Tensor parallelism (set all three to enable): activation sharding
    # constraints over a (data_axis, model_axis) mesh matching the param
    # shardings in swift_tpu.parallel.sharding — without these hints XLA's
    # SPMD partitioner falls back to full rematerialization on the window
    # reshapes. ``mesh`` is static metadata (hashable), not a traced value.
    mesh: Any = None
    data_axis: Optional[str] = "data"
    model_axis: Optional[str] = "model"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        auxiliary: Optional[jnp.ndarray] = None,
        jvp: bool = False,
        return_logvar: bool = False,
        stage: Optional[str] = None,
    ):
        """Full forward (``stage=None``) or one pipeline stage.

        ``stage`` carves the forward into the three pieces the
        pipeline-parallel executor (parallel/pipeline.py) schedules across
        a ``pipe`` mesh axis — the reference only stubbed this
        (``pipeline_engine`` dead kwarg + "TODO: PP Prediction",
        reference generating/diffusion.py:25,65-71):

        * ``"embed"``:  (x, t, auxiliary) -> (hidden (B, N, dim),
          conditioning vector (B, dim) fp32);
        * ``"pairs"``:  reinterprets (x, t) as (hidden, conditioning) and
          runs this model's block-pair stack (clone with ``depth`` = 2x the
          local pair count to run a slice of a larger model's stack);
        * ``"head"``:   reinterprets (x, t) as (hidden, conditioning) and
          applies the output (+logvar) head.

        Each stage touches only its own parameters, so it can be applied
        with a params subtree (flax ignores unvisited entries).

        Non-divisible latitude: when H doesn't divide by patch·window (the
        0.25° WB2 grid is 721 rows), the input is edge-padded toward the
        pole up to the next multiple (721 -> 736 for patch 2 × window 16)
        and the output cropped back — callers (losses, samplers, trainer)
        see the raw grid end to end. Same padded geometry as
        ``parallel.sharding.pad_lat_to_grid``, so checkpoints interchange
        with models built at the padded resolution.
        """
        assert stage in (None, "embed", "pairs", "head")
        H, W = _as_2tuple(self.img_resolution)
        ph, pw = _as_2tuple(self.patch_size)
        wh, ww = _as_2tuple(self.window_size)
        lat_pad = (-H) % (ph * wh)
        Hp = H + lat_pad
        gh, gw = Hp // ph, W // pw
        B = x.shape[0]
        if stage in ("pairs", "head"):
            # (x, t) are (hidden states, conditioning vector) here.
            h = x
            cond = jnp.asarray(t, jnp.float32)
            assert h.shape[1:] == (gh * gw, self.dim) and cond.shape == (B, self.dim)
        else:
            assert x.shape[1] == H and x.shape[2] == W, (
                f"expected NHWC input {(H, W)}, got {x.shape}"
            )
            if lat_pad:
                x = jnp.pad(x, ((0, 0), (0, lat_pad), (0, 0), (0, 0)),
                            mode="edge")

            # --- patch embedding: (B, Hp, W, C) -> (B, gh*gw, ph*pw*C) -> dim.
            # Feature ordering (p1, p2, c) matches the reference rearrange
            # (swinv2.py:224-229) so checkpoints map 1:1.
            xp = x.reshape(B, gh, ph, gw, pw, x.shape[-1])
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, ph * pw * x.shape[-1])
            h = nn.Dense(
                self.dim, kernel_init=_TRUNC02, dtype=self.dtype, name="patch_embed"
            )(xp)
            h = _wsc(h, self.mesh, self.data_axis, None, None)

            pos_init = lambda key, shape: 0.02 * jax.random.normal(  # noqa: E731
                key, shape, jnp.float32
            )
            if self.pos_embed_mode == "factorized":
                pos_r = self.param("pos_embed_row", pos_init, (1, gh, 1, self.dim))
                pos_c = self.param("pos_embed_col", pos_init, (1, 1, gw, self.dim))
                # broadcast sum in bf16; XLA fuses it into the add (the full
                # (gh, gw, dim) table never hits HBM in fp32).
                pos2d = pos_r.astype(self.dtype) + pos_c.astype(self.dtype)
                h = h + pos2d.reshape(1, gh * gw, self.dim)
            else:
                pos = self.param("pos_embed", pos_init, (1, gh * gw, self.dim))
                h = h + pos.astype(self.dtype)

            # --- conditioning vector.
            t = _broadcast_t(t, B)
            emb = timestep_embedding(t * self.timestep_weight, self.dim)
            if self.auxiliary_dim and auxiliary is not None:
                aux = jnp.asarray(auxiliary, jnp.float32).reshape(B, self.auxiliary_dim)
                emb = emb + nn.Dense(
                    self.dim,
                    kernel_init=_TRUNC02,
                    dtype=jnp.float32,
                    name="auxiliary_embed",
                )(aux * math.sqrt(self.auxiliary_dim))
            # latent MLP (reference swinv2.py:67-74): silu(l2(silu(l1(e)))).
            e = nn.Dense(self.dim, kernel_init=_TRUNC02, dtype=jnp.float32, name="latent_l1")(emb)
            e = nn.Dense(self.dim, kernel_init=_TRUNC02, dtype=jnp.float32, name="latent_l2")(
                jax.nn.silu(e)
            )
            cond = jax.nn.silu(e)
        if stage == "embed":
            return h, cond
        cond_c = cond.astype(self.dtype)

        # --- transformer stack.
        head_dim = self.head_dim or self.dim // self.heads
        mlp_dim = int(8 / 3.0 * self.dim)
        sh, sw = _as_2tuple(self.shift_size)
        if stage == "head":
            pass
        elif self.scan_layers and self.depth % 2 == 0:
            body = SwinBlockPair
            if self.remat_layers and not jvp:
                # prevent_cse=False is safe (and faster) under scan. The
                # jvp-flagged forward skips remat: its output is
                # stop_gradient'ed by the sCM loss (nothing to recompute in
                # any backward) and jvp-of-checkpoint blows up trace size.
                body = nn.remat(SwinBlockPair, prevent_cse=False)
            ScannedPairs = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth // 2,
                in_axes=nn.broadcast,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            h, _ = ScannedPairs(
                dim=self.dim, heads=self.heads, head_dim=head_dim,
                mlp_dim=mlp_dim, window_size=(wh, ww), grid_size=(gh, gw),
                shift=(sh, sw), jvp=jvp, dtype=self.dtype,
                use_pallas=self.use_pallas, name="pairs",
                mesh=self.mesh, data_axis=self.data_axis,
                model_axis=self.model_axis,
                remat_blocks=self.remat_blocks,
                quant=self.quant,
            )(h, cond_c)
        else:
            for i in range(self.depth):
                shift = (sh, sw) if (sh or sw) and i % 2 != 0 else (0, 0)
                h = SwinBlock(
                    dim=self.dim,
                    heads=self.heads,
                    head_dim=head_dim,
                    mlp_dim=mlp_dim,
                    window_size=(wh, ww),
                    grid_size=(gh, gw),
                    shift=shift,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"block{i}",
                    mesh=self.mesh,
                    data_axis=self.data_axis,
                    model_axis=self.model_axis,
                    quant=self.quant,
                )(h, cond_c, jvp)
        if stage == "pairs":
            return h

        # --- output head: (B, N, dim) -> (B, H, W, out_channels), zero-init.
        # Feature ordering (c, p1, p2) matches reference swinv2.py:240-243.
        o = nn.Dense(
            self.out_channels * ph * pw,
            use_bias=False,
            kernel_init=_ZEROS,
            dtype=self.dtype,
            name="head",
        )(h)
        o = o.reshape(B, gh, gw, self.out_channels, ph, pw)
        o = o.transpose(0, 1, 4, 2, 5, 3).reshape(B, Hp, W, self.out_channels)
        if lat_pad:
            o = o[:, :H]
        o = o.astype(jnp.float32)

        if self.logvar:
            # always construct the head so params exist regardless of the
            # return_logvar call-time flag (reference keeps it as a module
            # attribute, swinv2.py:281).
            lv = nn.Dense(
                1,
                kernel_init=_TRUNC02,
                dtype=jnp.float32,
                name="logvar_embed",
            )(cond)
            if return_logvar:
                return o, lv.squeeze(-1)
        return o
