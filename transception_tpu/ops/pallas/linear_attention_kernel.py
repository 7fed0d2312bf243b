"""Pallas TPU kernel: fused linear attention  out = Q' · (softmax_N(K)ᵀ · V).

One kernel instance per (batch·head): reads Q, K, V once from HBM, computes
the column softmax of K over the token axis, the (d_k, d_v) context matrix,
and the final product entirely in VMEM — the softmaxed K and the context
never round-trip through HBM (XLA's lowering materializes both). Optionally
also applies the row softmax of Q over channels (the Shen 'efficient
attention' variant, networks/MSTr.py:118-137); the CoaT factorized variant
(MSTr.py:864-871) passes q_softmax=False and scales outside.

Accumulation is fp32 on the MXU; softmax in fp32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic scoped-vmem stack limit is 16M; the kernel's peak is inputs +
# out + ~4 fp32 (N, dk) temporaries (k fp32 / exp / softmax + q softmax).
# Mosaic's allocator is less economical than the naive sum (measured: the
# (1, 6076, 64) bf16 instance needs 17.66M vs ~9.3M naive), so the
# estimate is doubled before gating.
_VMEM_STACK_LIMIT = 16 * 1024 * 1024


def eligible(q_shape, v_shape, dtype) -> bool:
    """Static shape gate. Measured on v5e: the fused kernel wins for
    single-/few-head shapes with head dim >= 64 (stage-1/decoder
    attention, 1.5-2.1x); many-head tiny-d shapes (MHCA stages, d=8..40)
    lower better via XLA, and very long single-head sequences (the
    6076-token bridge channel attention) exceed the Mosaic vmem stack."""
    B, h, N, dk = q_shape
    dv = v_shape[-1]
    itemsize = jnp.dtype(dtype).itemsize
    need = (3 * N * dk + N * dv) * itemsize + 4 * (4 * N * dk + dk * dv)
    return 2 * need <= _VMEM_STACK_LIMIT and min(dk, dv) >= 64


def eligible_folded(x_shape, dtype) -> bool:
    """Gate for the whole-block fold (LN1 + QKV Dense + linear attention +
    reprojection + residual in one kernel, head_count=1 — the only head
    count the reference ever uses, MSTr.py:155). One batch row must fit
    VMEM: the (N, C) stream in the compute dtype plus ~6 fp32 (N, C)
    temporaries (LN, q/k/v, softmaxes) and the (C, C) context."""
    B, N, C = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    need = (2 * N * C * itemsize          # x in + out
            + 6 * N * C * 4               # fp32 temporaries
            + 5 * C * C * itemsize        # 4 weights + context
            + N * 4 * 4)                  # LN/softmax row stats
    return 2 * need <= _VMEM_STACK_LIMIT and C >= 64 and N >= 8


def _folded_etb_kernel(x_ref, ls_ref, lb_ref, wq_ref, bq_ref, wk_ref,
                       bk_ref, wv_ref, bv_ref, wp_ref, bp_ref, o_ref, *,
                       eps: float, seg: int = 1):
    """norm1 -> {q,k,v} Dense -> softmax_d(Q)·(softmax_N(K)ᵀ·V) ->
    reprojection -> + raw-input residual, per batch row.

    Removes from XLA (vs the module composition in
    ops/attention.py:EfficientTransformerBlock): the norm1 read+write,
    three QKV Dense stream passes, the attention core round-trip, the
    reprojection pass and the residual add — HBM sees the raw (N, C) row
    once in and once out. Rounding points follow the module path: each
    Dense rounds its fp32 accumulator (+fp32 bias) to the compute dtype;
    softmaxes run fp32 and round back; the context rounds before the
    second contraction (ops/attention.py:49-55)."""
    from transception_tpu.ops.pallas.mixffn_kernel import _seg_max, _seg_mean

    f32 = jnp.float32
    dt = o_ref.dtype
    x = x_ref[0]                               # (N, C) dt
    C = x.shape[-1]
    xf = x.astype(f32)
    mu = _seg_mean(xf, seg)
    var = _seg_mean(xf * xf, seg) - mu * mu
    # Affine operands stay (1, C) 2-D — Mosaic lane-reshape restriction.
    hn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls_ref[...].astype(f32)
          + lb_ref[...].astype(f32)).astype(dt)  # (N, C) post-norm1

    def dense(w_ref, b_ref):
        y = jax.lax.dot_general(
            hn, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b_ref[...].astype(f32)
        return y.astype(dt)

    k = dense(wk_ref, bk_ref)
    q = dense(wq_ref, bq_ref)
    v = dense(wv_ref, bv_ref)

    kf = k.astype(f32)
    k_max = jnp.max(kf, axis=0, keepdims=True)
    k_exp = jnp.exp(kf - k_max)
    ks = (k_exp / jnp.sum(k_exp, axis=0, keepdims=True)).astype(dt)
    # Channel softmax (head_count=1 quirk: over ALL C channels) — with
    # seg=2 each packed row's channel half is its own softmax domain.
    qf = q.astype(f32)
    q_max = _seg_max(qf, seg)
    q_exp = jnp.exp(qf - q_max)
    half = C // 2
    if seg == 2:
        # _seg_mean's /half then *half is exact (half a power of two).
        q_den = _seg_mean(q_exp, seg) * half
    else:
        q_den = jnp.sum(q_exp, axis=1, keepdims=True)
    qs = (q_exp / q_den).astype(dt)

    ctx = jax.lax.dot_general(
        ks, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dt)  # (C, C)
    if seg == 2:
        # Zero the cross-row quadrants of the packed context.
        ri = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // half
        ci = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // half
        ctx = ctx * (ri == ci).astype(dt)
    att = jax.lax.dot_general(
        qs, ctx, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dt)  # (N, C)
    proj = jax.lax.dot_general(
        att, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bp_ref[...].astype(f32)
    o_ref[0] = (proj.astype(dt).astype(f32) + xf).astype(dt)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "pack"))
def efficient_attention_block_folded(x, ls, lb, wq, bq, wk, bk, wv, bv,
                                     wp, bp, eps: float = 1e-5,
                                     interpret: bool = False, pack=None):
    """x: (B, N, C) raw block input; LN + 4 Dense params fp32.
    Returns x + reproj(linear_attention(norm1(x))) — see
    _folded_etb_kernel. Raises NotImplementedError outside the VMEM gate.
    Affine params ship as (1, C) 2-D blocks (Mosaic rejects
    tile-unaligned 1-D fp32 operands).

    pack=2: two batch rows ride side-by-side in the lane dim —
    block-diagonal Dense kernels, segmented LN/softmax stats, cross-row
    context quadrants masked (same lane-packing as mhca_block_kernel).
    MEASURED A NET LOSS at the production (128, 3136, 64) geometry
    (1.42 -> 1.68 ms, scripts/probe_etb_pack.py): unlike the small-map
    MHCA blocks this kernel is VMEM-pressure-bound — the packed (N, 2C)
    fp32 temporaries (~1.6 MB each) crowd out Mosaic's grid
    double-buffering. Default stays unpacked; the knob remains for
    re-measurement on hardware with larger VMEM."""
    B, N, C = x.shape
    if not eligible_folded(x.shape, x.dtype):
        raise NotImplementedError("shape ineligible for the folded kernel")
    dt = x.dtype
    if pack is None:
        pack = 1
    B_out, C_out = B, C
    if pack == 2:
        def dup(a):
            return jnp.concatenate([a, a], axis=-1)

        def bdiag(wm):
            z = jnp.zeros_like(wm)
            return jnp.concatenate(
                [jnp.concatenate([wm, z], 1), jnp.concatenate([z, wm], 1)],
                0)

        x = jnp.concatenate([x[:B // 2], x[B // 2:]], axis=-1)
        wq, wk, wv, wp = map(bdiag, (wq, wk, wv, wp))
        ls, lb, bq, bk, bv, bp = map(dup, (ls, lb, bq, bk, bv, bp))
        B, C = B // 2, 2 * C
    row2d = lambda a: a.reshape(1, C)  # noqa: E731
    wcast = lambda w: w.astype(dt)     # noqa: E731

    wspec = pl.BlockSpec((C, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_folded_etb_kernel, eps=eps, seg=pack),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,              # ln scale/bias
            wspec, vspec,              # q
            wspec, vspec,              # k
            wspec, vspec,              # v
            wspec, vspec,              # reprojection
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * C * 6,
            bytes_accessed=2 * B * N * C * jnp.dtype(dt).itemsize,
            transcendentals=2 * B * N * C,
        ),
        interpret=interpret,
    )(x, row2d(ls), row2d(lb), wcast(wq), row2d(bq), wcast(wk), row2d(bk),
      wcast(wv), row2d(bv), wcast(wp), row2d(bp))
    if pack == 2:
        out = jnp.concatenate([out[..., :C_out], out[..., C_out:]], axis=0)
    return out


def _kernel(q_ref, k_ref, v_ref, o_ref, *, q_softmax: bool):
    q = q_ref[0]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]

    # softmax over tokens (axis 0 of the (N, dk) block) for K.
    k_max = jnp.max(k, axis=0, keepdims=True)
    k_exp = jnp.exp(k - k_max)
    k_sm = k_exp / jnp.sum(k_exp, axis=0, keepdims=True)

    # context = softmax-Kᵀ V : (dk, dv), fp32 accumulation on the MXU.
    ctx = jax.lax.dot_general(
        k_sm.astype(v.dtype), v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if q_softmax:
        qf = q.astype(jnp.float32)
        q_max = jnp.max(qf, axis=1, keepdims=True)
        q_exp = jnp.exp(qf - q_max)
        q_use = (q_exp / jnp.sum(q_exp, axis=1, keepdims=True)).astype(v.dtype)
    else:
        q_use = q

    out = jax.lax.dot_general(
        q_use, ctx.astype(v.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_softmax", "interpret"))
def linear_attention(q, k, v, q_softmax: bool = False,
                     interpret: bool = False):
    """q, k: (B, h, N, dk); v: (B, h, N, dv) -> (B, h, N, dv).

    Raises NotImplementedError for shapes that don't fit the VMEM budget —
    callers fall back to the XLA einsum pair."""
    B, h, N, dk = q.shape
    dv = v.shape[-1]
    itemsize = jnp.dtype(q.dtype).itemsize
    if not eligible(q.shape, v.shape, q.dtype):
        raise NotImplementedError("shape ineligible for the fused kernel")

    bh = B * h
    qr = q.reshape(bh, N, dk)
    kr = k.reshape(bh, N, dk)
    vr = v.reshape(bh, N, dv)

    out = pl.pallas_call(
        functools.partial(_kernel, q_softmax=q_softmax),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, N, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, N, dv), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (N * dk * dv + N * dk * dv),
            bytes_accessed=(2 * N * dk + 2 * N * dv) * bh * itemsize,
            transcendentals=bh * N * dk,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(B, h, N, dv)
