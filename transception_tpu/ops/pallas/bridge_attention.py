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
