"""Dispatch facade for the fused Pallas linear-attention kernel.

Returns None when the kernel can't run (non-TPU target, VMEM-exceeding or
tiny-head shapes) so callers fall back to the numerically-identical XLA
einsum pair. The fused forward carries a custom VJP whose backward is the
standard einsum chain (recomputing the softmaxes — remat-friendly), so the
kernel is usable inside jax.grad / the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _target_platform() -> str:
    # jax_default_device overrides the backend (some TPU plugins ignore
    # JAX_PLATFORMS, so the default device is the reliable signal).
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def _softmax_vjp(s, ds, axis):
    inner = jnp.sum(s * ds, axis=axis, keepdims=True)
    return s * (ds - inner)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(q, k, v, q_softmax):
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    return lak.linear_attention(q, k, v, q_softmax=q_softmax)


def _fused_fwd(q, k, v, q_softmax):
    return _fused(q, k, v, q_softmax), (q, k, v)


def _fused_bwd(q_softmax, res, g):
    q, k, v = res
    f32 = jnp.float32
    ks = jax.nn.softmax(k.astype(f32), axis=2)
    q_use = jax.nn.softmax(q.astype(f32), axis=3) if q_softmax \
        else q.astype(f32)
    gf = g.astype(f32)
    vf = v.astype(f32)
    ctx = jnp.einsum("bhnk,bhnv->bhkv", ks, vf)
    d_quse = jnp.einsum("bhnv,bhkv->bhnk", gf, ctx)
    d_ctx = jnp.einsum("bhnk,bhnv->bhkv", q_use, gf)
    dv = jnp.einsum("bhnk,bhkv->bhnv", ks, d_ctx)
    d_ks = jnp.einsum("bhnv,bhkv->bhnk", vf, d_ctx)
    dk = _softmax_vjp(ks, d_ks, axis=2)
    dq = _softmax_vjp(q_use, d_quse, axis=3) if q_softmax else d_quse
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_linear_attention(q, k, v, q_softmax: bool = False):
    """q, k: (B, h, N, dk) raw (pre-softmax); v: (B, h, N, dv).
    Computes softmax_N(K) internally; optionally softmax_d(Q)."""
    if _target_platform() != "tpu":
        return None
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    if not lak.eligible(q.shape, v.shape, q.dtype):
        return None
    return _fused(q, k, v, q_softmax)
