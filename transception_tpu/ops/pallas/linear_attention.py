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


# ---- whole-block fold: LN1 + QKV + attention + reproj + residual ----

def can_fold_etb(x_shape, dtype) -> bool:
    if _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    return lak.eligible_folded(x_shape, dtype)


def _reference_etb_folded(x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp, eps):
    """jnp mirror of _folded_etb_kernel (same rounding points) — the VJP
    body and the CPU parity target. Matches the module composition
    LN -> EfficientAttention -> residual (ops/attention.py:139-144,
    head_count=1) at bf16 resolution."""
    dt = x.dtype
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    hn = ((xf - mu) * jax.lax.rsqrt(var + eps) * ls.astype(f32)
          + lb.astype(f32)).astype(dt)

    def dense(w, b):
        y = jnp.einsum("bnc,cd->bnd", hn, w.astype(dt),
                       preferred_element_type=f32) + b.astype(f32)
        return y.astype(dt)

    k = dense(wk, bk)
    q = dense(wq, bq)
    v = dense(wv, bv)
    ks = jax.nn.softmax(k.astype(f32), axis=1).astype(dt)
    qs = jax.nn.softmax(q.astype(f32), axis=2).astype(dt)
    ctx = jnp.einsum("bnk,bnv->bkv", ks, v,
                     preferred_element_type=f32).astype(dt)
    att = jnp.einsum("bnk,bkv->bnv", qs, ctx,
                     preferred_element_type=f32).astype(dt)
    proj = (jnp.einsum("bnc,cd->bnd", att, wp.astype(dt),
                       preferred_element_type=f32) + bp.astype(f32))
    return (proj.astype(dt).astype(f32) + xf).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _fused_etb(x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp, eps):
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    return lak.efficient_attention_block_folded(
        x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp, eps=eps)


def _fused_etb_fwd(x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp, eps):
    args = (x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp)
    return _fused_etb(*args, eps), args


def _fused_etb_bwd(eps, resids, g):
    # The fold is an eval-path optimization (the trainer builds the
    # unfolded graph); this VJP keeps a stray grad correct.
    _, vjp = jax.vjp(lambda *a: _reference_etb_folded(*a, eps), *resids)
    return vjp(g)


_fused_etb.defvjp(_fused_etb_fwd, _fused_etb_bwd)


def fused_etb_attention_folded(x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp,
                               eps: float = 1e-5):
    """x + reproj(linear_attention(norm1(x))) in one kernel
    (head_count=1); call can_fold_etb first."""
    return _fused_etb(x, ls, lb, wq, bq, wk, bk, wv, bv, wp, bp, eps)
