"""Dispatch facade for the fused bridge softmax-attention kernel.

Returns None when the kernel can't run (non-TPU, shape outside the VMEM
gate) so callers fall back to the XLA einsum+softmax path. The fused
forward carries a custom VJP whose backward is the standard recompute
chain, so the kernel is usable inside the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _target_platform() -> str:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(q, k, v, scale):
    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    return bak.bridge_softmax_attention(q, k, v, scale=scale)


def _fused_fwd(q, k, v, scale):
    return _fused(q, k, v, scale), (q, k, v)


def _fused_bwd(scale, res, g):
    q, k, v = res
    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    if _target_platform() == "tpu" and bak.eligible(q.shape, k.shape,
                                                    q.dtype):
        # Flash-style Pallas backward: recomputes the probability matrix
        # per N-tile in VMEM; the XLA chain below materializes the
        # (B, N, M) fp32 matrix in HBM twice (dSoftmax and dV paths).
        return bak.bridge_softmax_attention_bwd(q, k, v, g, scale=scale)
    f32 = jnp.float32
    logits = jnp.einsum("bhnd,bhmd->bhnm", q.astype(f32), k.astype(f32)) \
        * scale
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.astype(f32)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, v.astype(f32))
    dl = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bhnm,bhmd->bhnd", dl, k.astype(f32))
    dk = scale * jnp.einsum("bhnm,bhnd->bhmd", dl, q.astype(f32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_bridge_attention(q, k, v, scale: float):
    """q: (B, h, N, d); k, v: (B, h, M, d) ->
    softmax(q·kᵀ·scale, axis=M)·v, or None if the kernel can't run."""
    if _target_platform() != "tpu":
        return None
    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    if not bak.eligible(q.shape, k.shape, q.dtype):
        return None
    return _fused(q, k, v, scale)


# ---- q/proj/residual-folded variant (eval path) ----

def can_fold_attention(x_shape, k_shape, heads: int, dtype) -> bool:
    if _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    return bak.eligible_folded(x_shape, k_shape, heads, dtype)


def _reference_folded(x, res, wq, bq, k, v, wp, bp, scale):
    """jnp mirror of the folded kernel (for the VJP): res + proj(MHA(x)),
    with the XLA path's rounding points (models/bridge.py
    MEfficientSelfAtten)."""
    B, N, C = x.shape
    _, heads, M, d = k.shape
    dt = x.dtype
    f32 = jnp.float32
    q = (jnp.einsum("bnc,cd->bnd", x, wq.astype(dt),
                    preferred_element_type=f32)
         + bq.astype(f32)).astype(dt)
    q = q.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k.astype(dt),
                        preferred_element_type=f32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(dt),
                     preferred_element_type=f32).astype(dt)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    proj = (jnp.einsum("bnc,cd->bnd", out, wp.astype(dt),
                       preferred_element_type=f32)
            + bp.astype(f32)).astype(dt)
    return (proj.astype(f32) + res.astype(f32)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_folded(x, res, wq, bq, k, v, wp, bp, scale):
    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    return bak.bridge_attention_folded(x, res, wq, bq, k, v, wp, bp,
                                       scale=scale)


def _fused_folded_fwd(x, res, wq, bq, k, v, wp, bp, scale):
    args = (x, res, wq, bq, k, v, wp, bp)
    return _fused_folded(*args, scale), args


def _fused_folded_bwd(scale, resids, g):
    # Training uses the UNFOLDED kernel (flash backward); this VJP exists
    # only so a stray grad through an eval-configured model is correct.
    _, vjp = jax.vjp(lambda *a: _reference_folded(*a, scale), *resids)
    return vjp(g)


_fused_folded.defvjp(_fused_folded_fwd, _fused_folded_bwd)


def fused_bridge_attention_folded(x, res, wq, bq, k, v, wp, bp,
                                  scale: float):
    """res + proj(MHA(x)) in one kernel; call can_fold_attention first."""
    return _fused_folded(x, res, wq, bq, k, v, wp, bp, scale)
