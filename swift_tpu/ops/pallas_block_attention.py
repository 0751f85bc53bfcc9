"""Layout-native fused Swin block attention (TPU Pallas).

The round-1 per-head kernel (pallas_attention.py) fused QK^T+softmax+PV but
left the *layout* work to XLA: cyclic roll, window partition, three
head-split transposes, the qkv chunk slices, the q/k cosine normalization,
and the inverse of all of it on the way out. At the flagship's shapes those
layout passes cost more than the attention math itself (profile: ~300 ms of
copies/slices/converts vs ~90 ms of attention in a 912 ms forward at B=24).

This kernel consumes the qkv projection's natural output — one
``(B, gh, gw, heads·3·d)`` tensor in the reference's per-head [q|k|v]
interleave (reference src/swift/models/swinv2.py:118-122) — and produces
attention output directly in ``(B, gh, gw, heads·d)`` spatial layout:

  * grid ``(B, heads)``: one program owns one (sample, head) and loops over
    all windows in-register — large enough programs that Mosaic's per-step
    overhead vanishes (the per-head kernel ran 9216 tiny programs);
  * the same qkv array is passed three times with different index maps —
    the q/k/v chunks of head ``h`` sit at 88-wide feature blocks
    ``3h, 3h+1, 3h+2`` — so the head split costs zero data movement;
  * cosine normalization (fp32) + the learned per-head logit scale happen
    on the VMEM tile (reference swinv2.py:116-127);
  * the odd-block cyclic shift (reference swinv2.py:193-194) is folded in:
    each window is read from and written back to its wrapped (shifted)
    coordinates directly — only the wrap-around row/column windows pay a
    concat; no HBM roll passes at all.

Backward is a mirrored kernel (same grid/blocks) that recomputes the
softmax and emits dqkv in the same interleaved layout plus per-(sample,
head) partials of the logit-scale gradient; a forward-mode tangent kernel
(custom_jvp) serves the sCM loss so both sCM forwards ride fused kernels.

Mosaic requires lane-dim blocks divisible by 128; the 88-wide head chunks
are therefore zero-padded to 128 — by the CALLER padding the projection
weight columns (swinv2.WindowAttention), or by fused_block_attention
padding the activation as a fallback. Zero lanes are invariant through the
cosine norms, QK^T, and PV, so no masking is needed.

Shapes must satisfy ``gh % wh == 0``, ``gw % ww == 0`` and sublane
alignment (``ww % 8 == 0`` when ``ww < gw``; shift multiples of 8 on the
width axis); callers gate on :func:`block_attention_eligible` and fall back
to the per-head path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swift_tpu.ops import jvp_guard

_EPS = 1e-12


def block_attention_eligible(
    grid_size, window_size, shift, heads: int, dim_inner: int
) -> bool:
    """Static shape gate for the layout-native kernel (Mosaic sublane rules)."""
    gh, gw = grid_size
    wh, ww = window_size
    sh, sw = shift
    d, rem = divmod(dim_inner, heads)
    if rem:
        return False
    if gh % wh or gw % ww:
        return False
    # window column slices / width rolls act on the sublane dim -> 8-aligned
    if gw // ww > 1 and ww % 8:
        return False
    if sw and sw % 8:
        return False
    # keep the whole (gh, gw, d) tile + logits comfortably in VMEM; the
    # kernel pads the head dim to the next multiple of 128 (_padded_dim), so
    # the estimate must use the padded width, not max(d, 128) (ADVICE r2).
    n = wh * ww
    if n > 1024 or gh * gw * _padded_dim(d) * 4 > 24 * 1024 * 1024:
        return False
    return True


def _wrap_pieces(start: int, size: int, dim: int):
    """Static (offset, length) pieces of a wrapped [start, start+size) range."""
    s = start % dim
    if s + size <= dim:
        return [(s, size)]
    return [(s, dim - s), (0, size - (dim - s))]


def _gather_window(t, i0: int, j0: int, wh: int, ww: int):
    """Read a (wh, ww, d) window starting at wrapped coords (i0, j0) of a
    (gh, gw, d) tile. Non-wrapping windows (all but the last row/col under a
    half-window shift) are a single static slice — much cheaper than rolling
    the whole tile and slicing (the r2.0 kernel's relayout hotspot)."""
    rp = _wrap_pieces(i0, wh, t.shape[0])
    cp = _wrap_pieces(j0, ww, t.shape[1])
    rows = []
    for (a, n) in rp:
        if len(cp) == 1:
            b, m = cp[0]
            rows.append(t[a:a + n, b:b + m])
        else:
            rows.append(jnp.concatenate(
                [t[a:a + n, b:b + m] for (b, m) in cp], axis=1))
    return rows[0] if len(rp) == 1 else jnp.concatenate(rows, axis=0)


def _scatter_window(o_ref, val, i0: int, j0: int):
    """Write a (wh, ww, d) window to wrapped coords of o_ref[0]."""
    wh, ww = val.shape[0], val.shape[1]
    gh = o_ref.shape[1]
    gw = o_ref.shape[2]
    for (a, n) in _wrap_pieces(i0, wh, gh):
        ra = (a - i0) % gh
        for (b, m) in _wrap_pieces(j0, ww, gw):
            cb = (b - j0) % gw
            o_ref[0, a:a + n, b:b + m, :] = val[ra:ra + n, cb:cb + m]


def _window_attn_fwd(qw, kw, vw, s, mm_dtype):
    """One window: cosine attention. qw/kw/vw: (n, d) raw projections."""
    qf = qw.astype(jnp.float32)
    kf = kw.astype(jnp.float32)
    qn = qf * jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS) * s
    kn = kf * jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
    logits = jax.lax.dot_general(
        qn.astype(mm_dtype), kn.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits - jnp.max(logits, -1, keepdims=True)
    e = jnp.exp(logits)
    p = e / jnp.sum(e, -1, keepdims=True)
    return jnp.dot(
        p.astype(mm_dtype), vw.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, s_ref, o_ref, *, wh, ww, sh, sw):
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # (gh, gw, d)
    gh, gw, d = q.shape
    mm = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else o_ref.dtype
    # cosine-normalize the WHOLE tile once (normalize is per-token, window-
    # independent): one big VPU pass instead of a per-window fp32 gather +
    # rsqrt sequence — the kernel was VPU-bound (PERF.md r2 lever #1).
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = (
        qf * jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS) * s
    ).astype(mm)
    kn = (
        kf * jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
    ).astype(mm)
    # shifted-window attention on the torus == attention on windows whose
    # origin is offset by (sh, sw): read/write each window at its wrapped
    # coordinates instead of rolling whole tiles (only the wrap-around
    # row/column windows pay a concat).
    n = wh * ww
    for i in range(gh // wh):
        for j in range(gw // ww):
            i0, j0 = (i * wh + sh) % gh, (j * ww + sw) % gw
            qw = _gather_window(qn, i0, j0, wh, ww).reshape(n, d)
            kw = _gather_window(kn, i0, j0, wh, ww).reshape(n, d)
            vw = _gather_window(v, i0, j0, wh, ww).reshape(n, d)
            logits = jax.lax.dot_general(
                qw, kw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits - jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits)
            p = e / jnp.sum(e, -1, keepdims=True)
            o = jnp.dot(p.astype(mm), vw.astype(mm),
                        preferred_element_type=jnp.float32)
            _scatter_window(
                o_ref, o.astype(o_ref.dtype).reshape(wh, ww, d), i0, j0
            )


def _bwd_kernel(
    q_ref, k_ref, v_ref, s_ref, do_ref, dqkv_ref, dsp_ref, *, wh, ww, sh, sw
):
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    gh, gw, d = q.shape
    mm = jnp.bfloat16 if do_ref.dtype == jnp.bfloat16 else jnp.float32
    ds_total = jnp.zeros((), jnp.float32)
    for i in range(gh // wh):
        for j in range(gw // ww):
            i0, j0 = (i * wh + sh) % gh, (j * ww + sw) % gw
            n = wh * ww
            qf = _gather_window(q, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            kf = _gather_window(k, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            vw = _gather_window(v, i0, j0, wh, ww).reshape(n, d)
            dow = _gather_window(do, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)

            rq = jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS)
            rk = jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
            qh = qf * rq  # normalized q (no scale)
            kh = kf * rk
            qn = qh * s
            logits = jax.lax.dot_general(
                qn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, -1, keepdims=True)

            dv = jax.lax.dot_general(  # p^T @ do
                p.astype(mm), dow.astype(mm), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(  # do @ v^T
                dow.astype(mm), vw.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dS = p * (dp - jnp.sum(p * dp, -1, keepdims=True))
            # d/dscale: logits = s * (qh @ kh^T)  ->  sum(dS * logits) / s
            ds_total += jnp.sum(dS * logits) / s
            dqn = jnp.dot(dS.astype(mm), kh.astype(mm),
                          preferred_element_type=jnp.float32)
            dkh = jax.lax.dot_general(  # dS^T @ qn
                dS.astype(mm), qn.astype(mm), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqh = dqn * s
            dqf = (dqh - qh * jnp.sum(dqh * qh, -1, keepdims=True)) * rq
            dkf = (dkh - kh * jnp.sum(dkh * kh, -1, keepdims=True)) * rk
            tile = jnp.concatenate(
                [dqf.astype(dqkv_ref.dtype).reshape(wh, ww, d),
                 dkf.astype(dqkv_ref.dtype).reshape(wh, ww, d),
                 dv.astype(dqkv_ref.dtype).reshape(wh, ww, d)],
                axis=-1,
            )
            _scatter_window(dqkv_ref, tile, i0, j0)
    # Mosaic can't store scalars to VMEM; write the (1,1,1,1) block whole.
    dsp_ref[...] = jnp.broadcast_to(ds_total, (1, 1, 1, 1))


def _specs(B, gh, gw, heads, d):
    """(q, k, v, scale) input specs over the shared qkv array."""
    qkv_block = (1, gh, gw, d)

    def chunk(off):
        return pl.BlockSpec(
            qkv_block, lambda b, h, off=off: (b, 0, 0, 3 * h + off),
            memory_space=pltpu.VMEM,
        )

    # scalar-per-(program) operands ride as (1, heads, 1, 1) VMEM arrays:
    # (1,1,1,1) blocks satisfy Mosaic's last-two-dims rule by equality.
    s_spec = pl.BlockSpec(
        (1, 1, 1, 1), lambda b, h: (0, h, 0, 0), memory_space=pltpu.VMEM
    )
    return [chunk(0), chunk(1), chunk(2), s_spec]


def _fwd_call(qkv, scale, heads, window_size, shift):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    sh, sw = shift
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_fwd_kernel, wh=wh, ww=ww, sh=sh, sw=sw)
    return pl.pallas_call(
        kern,
        grid=(B, heads),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=_specs(B, gh, gw, heads, d),
        out_specs=pl.BlockSpec(
            (1, gh, gw, d), lambda b, h: (b, 0, 0, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, gh, gw, heads * d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (2 * n * n * d),
            bytes_accessed=4 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, scale.reshape(1, heads, 1, 1).astype(jnp.float32))


def _bwd_call(qkv, scale, dout, heads, window_size, shift):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    sh, sw = shift
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_bwd_kernel, wh=wh, ww=ww, sh=sh, sw=sw)
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    in_specs = _specs(B, gh, gw, heads, d) + [
        pl.BlockSpec((1, gh, gw, d), lambda b, h: (b, 0, 0, h),
                     memory_space=pltpu.VMEM)
    ]
    dqkv, dsp = pl.pallas_call(
        kern,
        grid=(B, heads),
        compiler_params=compiler_params,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, gh, gw, 3 * d), lambda b, h: (b, 0, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((B, heads, 1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (5 * n * n * d),
            bytes_accessed=8 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, scale.reshape(1, heads, 1, 1).astype(jnp.float32), dout)
    return dqkv, dsp.reshape(B, heads).sum(axis=0).astype(scale.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fba_padded(qkv, scale, heads, window_size, shift):
    """Kernel entry at lane-aligned head width (d % 128 == 0)."""
    return _fwd_call(qkv, scale, heads, window_size, shift)


def _fba_fwd(qkv, scale, heads, window_size, shift):
    return _fwd_call(qkv, scale, heads, window_size, shift), (qkv, scale)


def _fba_bwd(heads, window_size, shift, res, dout):
    qkv, scale = res
    return _bwd_call(qkv, scale, dout.astype(qkv.dtype), heads, window_size, shift)


_fba_padded.defvjp(_fba_fwd, _fba_bwd)


def _tangent_kernel(
    q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref, s_ref, do_ref,
    *, wh, ww, sh, sw
):
    """Fused forward-mode tangent in the block layout: normalize-JVP +
    softmax-JVP + PV-JVP per window, all in VMEM (the sCM tangent term,
    reference loss.py:212-220). The logit scale carries no tangent (the sCM
    jvp differentiates w.r.t. x and t only)."""
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    dq, dk, dv = dq_ref[0], dk_ref[0], dv_ref[0]
    gh, gw, d = q.shape
    mm = jnp.bfloat16 if do_ref.dtype == jnp.bfloat16 else jnp.float32
    for i in range(gh // wh):
        for j in range(gw // ww):
            i0, j0 = (i * wh + sh) % gh, (j * ww + sw) % gw
            n = wh * ww
            qf = _gather_window(q, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            kf = _gather_window(k, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            vw = _gather_window(v, i0, j0, wh, ww).reshape(n, d)
            dqf = _gather_window(dq, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            dkf = _gather_window(dk, i0, j0, wh, ww).reshape(n, d).astype(jnp.float32)
            dvw = _gather_window(dv, i0, j0, wh, ww).reshape(n, d)

            rq = jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS)
            rk = jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
            qh = qf * rq
            kh = kf * rk
            # normalize JVP: d(q/|q|) = (dq - q̂ (q̂·dq)) / |q|
            dqh = (dqf - qh * jnp.sum(qh * dqf, -1, keepdims=True)) * rq
            dkh = (dkf - kh * jnp.sum(kh * dkf, -1, keepdims=True)) * rk
            qn, dqn = qh * s, dqh * s

            logits = jax.lax.dot_general(
                qn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, -1, keepdims=True)
            dS = (
                jax.lax.dot_general(
                    dqn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    qn.astype(mm), dkh.astype(mm), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            dp = p * (dS - jnp.sum(p * dS, -1, keepdims=True))
            dout = (
                jnp.dot(dp.astype(mm), vw.astype(mm),
                        preferred_element_type=jnp.float32)
                + jnp.dot(p.astype(mm), dvw.astype(mm),
                          preferred_element_type=jnp.float32)
            )
            _scatter_window(
                do_ref, dout.astype(do_ref.dtype).reshape(wh, ww, d), i0, j0
            )


def _tangent_call(qkv, dqkv, scale, heads, window_size, shift):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    sh, sw = shift
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_tangent_kernel, wh=wh, ww=ww, sh=sh, sw=sw)
    specs = _specs(B, gh, gw, heads, d)
    in_specs = specs[:3] + specs[:3] + [specs[3]]
    return pl.pallas_call(
        kern,
        grid=(B, heads),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, gh, gw, d), lambda b, h: (b, 0, 0, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, gh, gw, heads * d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (5 * n * n * d),
            bytes_accessed=7 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, dqkv, dqkv, dqkv,
      scale.reshape(1, heads, 1, 1).astype(jnp.float32))


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _fba_jvp_capable(qkv, scale, heads, window_size, shift):
    """Same fused primal as ``_fba_padded`` but with a forward-mode rule
    (the sCM tangent path). The tangent kernel has no AD rules of its own,
    so its inputs are stop_gradient'ed: an outer reverse-mode linearization
    sees symbolic-zero tangents and short-circuits — exact for the sCM loss,
    which stop_gradients the jvp output before use (loss.py:259-260)."""
    return _fwd_call(qkv, scale, heads, window_size, shift)


@functools.partial(_fba_jvp_capable.defjvp, symbolic_zeros=True)
def _fba_jvp_rule(heads, window_size, shift, primals, tangents):
    qkv, scale = primals
    dqkv, dscale = tangents
    jvp_guard.require_zero_tangents("fused_block_attention", scale=dscale)
    dqkv = jvp_guard.materialize(dqkv)
    o = _fba_padded(qkv, scale, heads, window_size, shift)
    do = _tangent_call(
        jax.lax.stop_gradient(qkv),
        jax.lax.stop_gradient(dqkv),
        jax.lax.stop_gradient(scale),
        heads, window_size, shift,
    )
    return o, do


def _padded_dim(d: int) -> int:
    return d if d % 128 == 0 else (d // 128 + 1) * 128


def fused_block_attention(qkv, scale, heads, window_size, shift=(0, 0),
                          jvp=False):
    """Swin window attention straight from the qkv projection's layout.

    qkv: (B, gh, gw, heads·3·d), per-head [q|k|v] interleave (the reference
      qkv chunk order, swinv2.py:118-122);
    scale: (heads,) — exp'ed, clamped per-head cosine-attention logit scale;
    window_size / shift: static (wh, ww) / (sh, sw); shift is applied as a
      cyclic roll of (-sh, -sw) before windowing and undone on the output,
      inside the kernel (reference swinv2.py:193-194,207-208).

    Mosaic requires lane-dim blocks divisible by 128, so each 88-wide head
    chunk is zero-padded to 128 around the kernel. The attention math is
    invariant to zero lanes (they contribute nothing to the cosine norms,
    QK^T, or PV), so no masking is needed; the pad/slice cost one cheap XLA
    copy each vs the ~10x larger layout passes this kernel eliminates.

    ``jvp=True`` selects the forward-mode-capable variant: the primal still
    rides the fused kernel (with a reverse-mode rule), and the tangent runs
    as its own fused kernel (the sCM path; see _fba_jvp_capable).

    Returns (B, gh, gw, heads·d) in qkv.dtype, head-major features.
    """
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    dp = _padded_dim(d)
    if dp != d:
        q5 = qkv.reshape(B, gh, gw, 3 * heads, d)
        q5 = jnp.pad(q5, ((0, 0),) * 4 + ((0, dp - d),))
        qkv = q5.reshape(B, gh, gw, 3 * heads * dp)
    fn = _fba_jvp_capable if jvp else _fba_padded
    out = fn(qkv, scale, heads, window_size, shift)
    if dp != d:
        out = out.reshape(B, gh, gw, heads, dp)[..., :d]
        out = out.reshape(B, gh, gw, heads * d)
    return out


def sharded_block_attention(
    qkv, scale, heads, window_size, shift=(0, 0),
    mesh=None, data_axis=None, model_axis=None, jvp=False,
):
    """fused_block_attention, shard_map'd over a (data, model) mesh.

    Batch shards over ``data_axis``; heads shard over ``model_axis`` as
    contiguous 3·d feature chunks — exactly the column-parallel qkv split
    (swift_tpu.parallel.sharding), so attention under TP needs no
    cross-shard communication. Axes that don't divide stay unsharded.
    """
    if mesh is None:
        return fused_block_attention(qkv, scale, heads, window_size, shift,
                                     jvp=jvp)

    B = qkv.shape[0]

    def usable(axis, size):
        return (
            axis is not None
            and axis in mesh.axis_names
            and mesh.shape[axis] > 1
            and size % mesh.shape[axis] == 0
        )

    b_ax = data_axis if usable(data_axis, B) else None
    h_ax = model_axis if usable(model_axis, heads) else None
    if not (b_ax or h_ax):
        return fused_block_attention(qkv, scale, heads, window_size, shift,
                                     jvp=jvp)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local_heads = heads // (mesh.shape[h_ax] if h_ax else 1)

    def f(qkv_l, scale_l):
        return fused_block_attention(
            qkv_l, scale_l, local_heads, window_size, shift, jvp=jvp
        )

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(b_ax, None, None, h_ax), P(h_ax)),
        out_specs=P(b_ax, None, None, h_ax),
        check_vma=False,
    )(qkv, scale)


# ---------------------------------------------------------------------------
# Window-tiled variant for LARGE grids (r2 VERDICT weak #2 / next #3).
#
# The kernel above holds one full (gh, gw, d) head tile in VMEM, which caps
# it at ~24 MB — the 0.25° WB2 grid (721x1440 -> 368x720 tokens after
# patching) needs ~135 MB and fell back to the per-head path at 34% MFU.
# Here a program owns a TILE of window rows: grid (B, heads, gh/bh) with
# (1, bh, gw, d) blocks, bh = th·wh. The cyclic shift is handled by ONE
# XLA roll of qkv before the kernel (and un-roll of the output) instead of
# in-kernel wrapped gathers: at 0.25° the roll costs ~8 ms/layer of HBM
# traffic, far less than the 2/3 of MXU time the per-head path wastes.
# Windows inside the kernel are therefore perfectly aligned static slices.


def tiled_block_attention_eligible(
    grid_size, window_size, heads: int, dim_inner: int
) -> bool:
    """Static gate for the window-tiled kernel (no shift constraints — the
    roll handles any shift; width wrap never reaches the kernel)."""
    gh, gw = grid_size
    wh, ww = window_size
    d, rem = divmod(dim_inner, heads)
    if rem:
        return False
    if gh % wh or gw % ww:
        return False
    # column slices act on the sublane dim of the (bh, gw, d) tile
    if gw // ww > 1 and ww % 8:
        return False
    if wh * ww > 1024:
        return False
    # one window-row of q/k/v/out, double-buffered, must fit comfortably
    if 8 * wh * gw * _padded_dim(d) * 2 > 48 * 1024 * 1024:
        return False
    return True


def _pick_row_tile(gh: int, gw: int, wh: int, dp: int) -> int:
    """Largest th (window-rows per program) dividing gh//wh whose bf16
    q/k/v/out tiles, double-buffered, stay under ~48 MB of VMEM."""
    nrow = gh // wh
    best = 1
    for th in range(1, nrow + 1):
        if nrow % th:
            continue
        if 8 * th * wh * gw * dp * 2 <= 48 * 1024 * 1024:
            best = th
    return best


def _tiled_specs(B, gh, gw, heads, d, bh):
    block = (1, bh, gw, d)

    def chunk(off):
        return pl.BlockSpec(
            block, lambda b, h, r, off=off: (b, r, 0, 3 * h + off),
            memory_space=pltpu.VMEM,
        )

    s_spec = pl.BlockSpec(
        (1, 1, 1, 1), lambda b, h, r: (0, h, 0, 0), memory_space=pltpu.VMEM
    )
    return [chunk(0), chunk(1), chunk(2), s_spec]


def _tiled_fwd_kernel(q_ref, k_ref, v_ref, s_ref, o_ref, *, wh, ww):
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # (bh, gw, d)
    bh, gw, d = q.shape
    mm = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else o_ref.dtype
    # full-tile cosine normalize (see _fwd_kernel): one VPU pass per tile.
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = (
        qf * jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS) * s
    ).astype(mm)
    kn = (
        kf * jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
    ).astype(mm)
    n = wh * ww
    for rw in range(bh // wh):
        for j in range(gw // ww):
            r0, c0 = rw * wh, j * ww
            qw = qn[r0:r0 + wh, c0:c0 + ww].reshape(n, d)
            kw = kn[r0:r0 + wh, c0:c0 + ww].reshape(n, d)
            vw = v[r0:r0 + wh, c0:c0 + ww].reshape(n, d)
            logits = jax.lax.dot_general(
                qw, kw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits - jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits)
            p = e / jnp.sum(e, -1, keepdims=True)
            o = jnp.dot(p.astype(mm), vw.astype(mm),
                        preferred_element_type=jnp.float32)
            o_ref[0, r0:r0 + wh, c0:c0 + ww, :] = (
                o.astype(o_ref.dtype).reshape(wh, ww, d)
            )


def _tiled_fwd_call(qkv, scale, heads, window_size, th):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    bh = th * wh
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_tiled_fwd_kernel, wh=wh, ww=ww)
    return pl.pallas_call(
        kern,
        grid=(B, heads, gh // bh),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=_tiled_specs(B, gh, gw, heads, d, bh),
        out_specs=pl.BlockSpec(
            (1, bh, gw, d), lambda b, h, r: (b, r, 0, h),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, gh, gw, heads * d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (2 * n * n * d),
            bytes_accessed=4 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, scale.reshape(1, heads, 1, 1).astype(jnp.float32))


def _tiled_bwd_kernel(
    q_ref, k_ref, v_ref, s_ref, do_ref, dqkv_ref, dsp_ref, *, wh, ww
):
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    bh, gw, d = q.shape
    mm = jnp.bfloat16 if do_ref.dtype == jnp.bfloat16 else jnp.float32
    ds_total = jnp.zeros((), jnp.float32)
    n = wh * ww
    for rw in range(bh // wh):
        for j in range(gw // ww):
            r0, c0 = rw * wh, j * ww
            qf = q[r0:r0 + wh, c0:c0 + ww].reshape(n, d).astype(jnp.float32)
            kf = k[r0:r0 + wh, c0:c0 + ww].reshape(n, d).astype(jnp.float32)
            vw = v[r0:r0 + wh, c0:c0 + ww].reshape(n, d)
            dow = do[r0:r0 + wh, c0:c0 + ww].reshape(n, d).astype(jnp.float32)

            rq = jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS)
            rk = jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
            qh = qf * rq
            kh = kf * rk
            qn = qh * s
            logits = jax.lax.dot_general(
                qn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, -1, keepdims=True)

            dv = jax.lax.dot_general(
                p.astype(mm), dow.astype(mm), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                dow.astype(mm), vw.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dS = p * (dp - jnp.sum(p * dp, -1, keepdims=True))
            ds_total += jnp.sum(dS * logits) / s
            dqn = jnp.dot(dS.astype(mm), kh.astype(mm),
                          preferred_element_type=jnp.float32)
            dkh = jax.lax.dot_general(
                dS.astype(mm), qn.astype(mm), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqh = dqn * s
            dqf = (dqh - qh * jnp.sum(dqh * qh, -1, keepdims=True)) * rq
            dkf = (dkh - kh * jnp.sum(dkh * kh, -1, keepdims=True)) * rk
            tile = jnp.concatenate(
                [dqf.astype(dqkv_ref.dtype).reshape(wh, ww, d),
                 dkf.astype(dqkv_ref.dtype).reshape(wh, ww, d),
                 dv.astype(dqkv_ref.dtype).reshape(wh, ww, d)],
                axis=-1,
            )
            dqkv_ref[0, r0:r0 + wh, c0:c0 + ww, :] = tile
    dsp_ref[...] = jnp.broadcast_to(ds_total, (1, 1, 1, 1))


def _tiled_bwd_call(qkv, scale, dout, heads, window_size, th):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    bh = th * wh
    nrt = gh // bh
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_tiled_bwd_kernel, wh=wh, ww=ww)
    in_specs = _tiled_specs(B, gh, gw, heads, d, bh) + [
        pl.BlockSpec((1, bh, gw, d), lambda b, h, r: (b, r, 0, h),
                     memory_space=pltpu.VMEM)
    ]
    dqkv, dsp = pl.pallas_call(
        kern,
        grid=(B, heads, nrt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bh, gw, 3 * d), lambda b, h, r: (b, r, 0, h),
                         memory_space=pltpu.VMEM),
            # per-(b, h, r) scalar partials: (heads, nrt) flattened into one
            # axis so the (1,1,1,1) block EQUALS the trailing array dims
            # (Mosaic's last-two-dims rule; CLAUDE.md rule 4).
            pl.BlockSpec(
                (1, 1, 1, 1),
                lambda b, h, r, nrt=nrt: (b, h * nrt + r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((B, heads * nrt, 1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (5 * n * n * d),
            bytes_accessed=8 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, scale.reshape(1, heads, 1, 1).astype(jnp.float32), dout)
    dsp = dsp.reshape(B, heads, nrt)
    return dqkv, dsp.sum(axis=(0, 2)).astype(scale.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tba_padded(qkv, scale, heads, window_size, th):
    """Tiled kernel entry at lane-aligned head width; qkv pre-rolled."""
    return _tiled_fwd_call(qkv, scale, heads, window_size, th)


def _tba_fwd(qkv, scale, heads, window_size, th):
    return _tiled_fwd_call(qkv, scale, heads, window_size, th), (qkv, scale)


def _tba_bwd(heads, window_size, th, res, dout):
    qkv, scale = res
    return _tiled_bwd_call(qkv, scale, dout.astype(qkv.dtype), heads,
                           window_size, th)


_tba_padded.defvjp(_tba_fwd, _tba_bwd)


def _tiled_tangent_kernel(
    q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref, s_ref, do_ref, *, wh, ww
):
    s = s_ref[0, 0, 0, 0]
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    dq, dk, dv = dq_ref[0], dk_ref[0], dv_ref[0]
    bh, gw, d = q.shape
    mm = jnp.bfloat16 if do_ref.dtype == jnp.bfloat16 else jnp.float32
    n = wh * ww
    for rw in range(bh // wh):
        for j in range(gw // ww):
            r0, c0 = rw * wh, j * ww
            sl = (slice(r0, r0 + wh), slice(c0, c0 + ww))
            qf = q[sl].reshape(n, d).astype(jnp.float32)
            kf = k[sl].reshape(n, d).astype(jnp.float32)
            vw = v[sl].reshape(n, d)
            dqf = dq[sl].reshape(n, d).astype(jnp.float32)
            dkf = dk[sl].reshape(n, d).astype(jnp.float32)
            dvw = dv[sl].reshape(n, d)

            rq = jax.lax.rsqrt(jnp.sum(qf * qf, -1, keepdims=True) + _EPS)
            rk = jax.lax.rsqrt(jnp.sum(kf * kf, -1, keepdims=True) + _EPS)
            qh = qf * rq
            kh = kf * rk
            dqh = (dqf - qh * jnp.sum(qh * dqf, -1, keepdims=True)) * rq
            dkh = (dkf - kh * jnp.sum(kh * dkf, -1, keepdims=True)) * rk
            qn, dqn = qh * s, dqh * s

            logits = jax.lax.dot_general(
                qn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, -1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, -1, keepdims=True)
            dS = (
                jax.lax.dot_general(
                    dqn.astype(mm), kh.astype(mm), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    qn.astype(mm), dkh.astype(mm), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            dpv = p * (dS - jnp.sum(p * dS, -1, keepdims=True))
            dout = (
                jnp.dot(dpv.astype(mm), vw.astype(mm),
                        preferred_element_type=jnp.float32)
                + jnp.dot(p.astype(mm), dvw.astype(mm),
                          preferred_element_type=jnp.float32)
            )
            do_ref[0, r0:r0 + wh, c0:c0 + ww, :] = (
                dout.astype(do_ref.dtype).reshape(wh, ww, d)
            )


def _tiled_tangent_call(qkv, dqkv, scale, heads, window_size, th):
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    bh = th * wh
    n = wh * ww
    nW = (gh // wh) * (gw // ww)
    kern = functools.partial(_tiled_tangent_kernel, wh=wh, ww=ww)
    specs = _tiled_specs(B, gh, gw, heads, d, bh)
    in_specs = specs[:3] + specs[:3] + [specs[3]]
    return pl.pallas_call(
        kern,
        grid=(B, heads, gh // bh),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bh, gw, d), lambda b, h, r: (b, r, 0, h),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, gh, gw, heads * d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * nW * (5 * n * n * d),
            bytes_accessed=7 * B * gh * gw * heads * d * qkv.dtype.itemsize,
            transcendentals=B * heads * nW * n * n,
        ),
    )(qkv, qkv, qkv, dqkv, dqkv, dqkv,
      scale.reshape(1, heads, 1, 1).astype(jnp.float32))


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _tba_jvp_capable(qkv, scale, heads, window_size, th):
    """Tiled kernel with a forward-mode rule (same contract as
    _fba_jvp_capable: tangent inputs stop_gradient'ed, scale tangent
    assumed zero — exact for the sCM loss)."""
    return _tiled_fwd_call(qkv, scale, heads, window_size, th)


@functools.partial(_tba_jvp_capable.defjvp, symbolic_zeros=True)
def _tba_jvp_rule(heads, window_size, th, primals, tangents):
    qkv, scale = primals
    dqkv, dscale = tangents
    jvp_guard.require_zero_tangents("fused_tiled_block_attention",
                                    scale=dscale)
    dqkv = jvp_guard.materialize(dqkv)
    o = _tba_padded(qkv, scale, heads, window_size, th)
    do = _tiled_tangent_call(
        jax.lax.stop_gradient(qkv),
        jax.lax.stop_gradient(dqkv),
        jax.lax.stop_gradient(scale),
        heads, window_size, th,
    )
    return o, do


def _roll2_single_pass(x, sh: int, sw: int):
    """Cyclic roll by (-sh, -sw) on axes (1, 2) built from four
    dynamic-update-slices of corner slices into ONE output buffer.

    jnp.roll over two axes lowers to two staged concats, materializing an
    extra array-sized temporary per stage — at the 0.25° qkv that is
    +2.27 GB per roll and was the top HBM allocation of the jvp train step
    (r3 OOM table). The DUS chain updates one buffer in place."""
    sh %= x.shape[1]
    sw %= x.shape[2]
    if sh == 0 and sw == 0:
        return x
    gh, gw = x.shape[1], x.shape[2]
    out = jnp.zeros_like(x)
    z = (0,) * (x.ndim - 3)

    def dus(o, val, r, c):
        return jax.lax.dynamic_update_slice(o, val, (0, r, c) + z)

    out = dus(out, x[:, sh:, sw:], 0, 0)
    if sw:
        out = dus(out, x[:, sh:, :sw], 0, gw - sw)
    if sh:
        out = dus(out, x[:, :sh, sw:], gh - sh, 0)
    if sh and sw:
        out = dus(out, x[:, :sh, :sw], gh - sh, gw - sw)
    return out


@functools.lru_cache(maxsize=None)
def _roll2_linear(sh: int, sw: int, gh: int, gw: int):
    """_roll2_single_pass with a custom transpose rule: the autodiff
    transpose of the DUS chain is a slice/add graph that materializes TWO
    extra array-sized temporaries per roll (43% HBM fragmentation in the
    0.25° train step); rolling the cotangent the other way is one buffer."""

    @jax.custom_vjp
    def roll(x):
        return _roll2_single_pass(x, sh, sw)

    def fwd(x):
        return roll(x), None

    def bwd(_, d):
        return (_roll2_single_pass(d, (gh - sh) % gh, (gw - sw) % gw),)

    roll.defvjp(fwd, bwd)
    return roll


def cyclic_roll2(x, sh: int, sw: int, jvp: bool = False):
    """Public single-pass cyclic roll by (-sh, -sw) on axes (1, 2).

    The vjp path uses the custom-transpose roll (rolling the cotangent the
    other way is ONE buffer); the jvp path uses the plain DUS chain, whose
    native forward-mode rule is exact. Used by the model to roll the
    shifted-window ACTIVATIONS before the qkv projection instead of rolling
    the 3x-wider qkv tensor after it (a token permutation commutes with the
    row-wise matmul — bit-exact): at 0.25° the roll temporaries drop from
    3x1.5 GB to 3x0.5 GB in the remat'd backward, the difference between
    the single-chip sCM step fitting and OOMing (PERF.md r5 ledger)."""
    gh, gw = x.shape[1], x.shape[2]
    sh %= gh
    sw %= gw
    if not (sh or sw):
        return x
    if jvp:
        return _roll2_single_pass(x, sh, sw)
    return _roll2_linear(sh, sw, gh, gw)(x)


def fused_tiled_block_attention(qkv, scale, heads, window_size, shift=(0, 0),
                                jvp=False):
    """Window-tiled fused block attention for grids too large for the
    whole-grid kernel (same qkv layout contract as fused_block_attention).

    The shift is ONE cyclic roll of qkv before the kernel (+ the inverse on
    the output); everything inside the kernel is aligned static slices, so
    there are no shift-alignment constraints at all."""
    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    dp = _padded_dim(d)
    if dp != d:
        q5 = qkv.reshape(B, gh, gw, 3 * heads, d)
        q5 = jnp.pad(q5, ((0, 0),) * 4 + ((0, dp - d),))
        qkv = q5.reshape(B, gh, gw, 3 * heads * dp)
    sh, sw = shift
    # jvp path: plain DUS roll (native forward-mode rule); vjp path: the
    # custom-transpose roll (single cotangent buffer).
    if sh or sw:
        if jvp:
            qkv = _roll2_single_pass(qkv, sh, sw)
        else:
            qkv = _roll2_linear(sh % gh, sw % gw, gh, gw)(qkv)
    th = _pick_row_tile(gh, gw, window_size[0], dp)
    fn = _tba_jvp_capable if jvp else _tba_padded
    out = fn(qkv, scale, heads, window_size, th)
    if sh or sw:
        if jvp:
            out = _roll2_single_pass(out, gh - sh, gw - sw)
        else:
            out = _roll2_linear((gh - sh) % gh, (gw - sw) % gw, gh, gw)(out)
    if dp != d:
        out = out.reshape(B, gh, gw, heads, dp)[..., :d]
        out = out.reshape(B, gh, gw, heads * d)
    return out


def reference_block_attention(qkv, scale, heads, window_size, shift=(0, 0)):
    """jnp reference: identical math via explicit roll/partition/transposes.

    Used by tests and as the general-shape fallback semantics definition.
    """
    from swift_tpu.ops.windows import cyclic_shift, window_partition, window_reverse

    B, gh, gw, feat = qkv.shape
    d = feat // (3 * heads)
    wh, ww = window_size
    sh, sw = shift
    x = cyclic_shift(qkv, (-sh, -sw)) if (sh or sw) else qkv
    x = window_partition(x, (wh, ww))  # (B, nW, n, feat)
    nW, n = x.shape[1], x.shape[2]
    x = x.reshape(B, nW, n, heads, 3 * d)
    q, k, v = jnp.split(x, 3, axis=-1)  # each (B, nW, n, h, d)

    def nrm(a):
        a = a.astype(jnp.float32)
        return a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + _EPS)

    qn = nrm(q) * scale.astype(jnp.float32)[None, None, None, :, None]
    kn = nrm(k)
    mm = qkv.dtype
    s = jnp.einsum("bwnhd,bwmhd->bwhnm", qn.astype(mm), kn.astype(mm),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bwhnm,bwmhd->bwnhd", p.astype(mm), v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(B, nW, n, heads * d).astype(qkv.dtype)
    o = window_reverse(o, (wh, ww), (gh, gw))
    if sh or sw:
        o = cyclic_shift(o, (sh, sw))
    return o
