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
