"""Dispatch facade for the fused patch-expand epilogue kernel.

can_fuse() is a static gate (platform + shapes) so callers can decide
BEFORE creating flax params which branch owns them (both branches create
identical param names: expand/kernel + norm/ln/{scale,bias}).
The fused forward carries a custom VJP whose backward is the plain XLA
chain via jax.vjp of a reference implementation — used only when
gradients flow through a use_pallas model (training defaults to the XLA
path, core/config.py use_pallas_train).
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


def can_fuse(x_shape, H: int, W: int, in_c: int, out_c: int, p: int,
             dtype) -> bool:
    if _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import expand_kernel as ek
    return ek.eligible(x_shape, H, W, in_c, out_c, p, dtype)


def _reference_impl(x, w, scale, bias, H, W, p, c, eps):
    """The XLA path (ops/common.py PatchExpand semantics), for the VJP."""
    B, N, C = x.shape
    y = jax.lax.dot_general(
        x.astype(x.dtype), w.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32).reshape(B, N * p * p, c)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) - jnp.square(mean)
    yn = (yf - mean) * jax.lax.rsqrt(var + eps)
    yn = yn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    yn = yn.astype(x.dtype)
    yn = yn.reshape(B, H, W, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return yn.reshape(B, p * p * N, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused(x, w, scale, bias, H, W, p, c, eps):
    from transception_tpu.ops.pallas import expand_kernel as ek
    B, N, C = x.shape
    y = ek.fused_patch_expand(x, w, scale, bias, H=H, W=W, p=p, c=c,
                              eps=eps)
    # Pixel shuffle stays in XLA (bf16, one fused copy): Mosaic cannot
    # shape-cast the lane dimension in-kernel.
    y = y.reshape(B, H, W, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, p * p * N, c)


def _fused_fwd(x, w, scale, bias, H, W, p, c, eps):
    return _fused(x, w, scale, bias, H, W, p, c, eps), (x, w, scale, bias)


def _fused_bwd(H, W, p, c, eps, res, g):
    x, w, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, w_, s_, b_: _reference_impl(x_, w_, s_, b_, H, W, p, c,
                                               eps), x, w, scale, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_expand(x, w, scale, bias, H: int, W: int, p: int, c: int,
                 eps: float = 1e-5):
    """Fused Dense->LN->pixel-shuffle; call can_fuse() first."""
    return _fused(x, w, scale, bias, H, W, p, c, eps)


def _reference_pre_shuffle(x, w, scale, bias, p, c, eps):
    """XLA mirror of the kernel output WITHOUT the pixel shuffle."""
    B, N, C = x.shape
    y = jax.lax.dot_general(
        x, w.astype(x.dtype), dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32).reshape(B, N * p * p, c)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) - jnp.square(mean)
    yn = (yf - mean) * jax.lax.rsqrt(var + eps)
    yn = yn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return yn.astype(x.dtype).reshape(B, N, p * p * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_pre(x, w, scale, bias, H, W, p, c, eps):
    from transception_tpu.ops.pallas import expand_kernel as ek
    return ek.fused_patch_expand(x, w, scale, bias, H=H, W=W, p=p, c=c,
                                 eps=eps)


def _fused_pre_fwd(x, w, scale, bias, H, W, p, c, eps):
    return _fused_pre(x, w, scale, bias, H, W, p, c, eps), (x, w, scale, bias)


def _fused_pre_bwd(H, W, p, c, eps, res, g):
    x, w, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, w_, s_, b_: _reference_pre_shuffle(x_, w_, s_, b_, p, c,
                                                      eps), x, w, scale, bias)
    return vjp(g)


_fused_pre.defvjp(_fused_pre_fwd, _fused_pre_bwd)


def fused_expand_pre_shuffle(x, w, scale, bias, H: int, W: int, p: int,
                             c: int, eps: float = 1e-5):
    """Fused Dense->LN, returned in PRE-shuffle token order (B, N, p²·c):
    the kernel's native output, with no XLA layout copies. For consumers
    that commute with the pixel shuffle (1x1 head conv + argmax)."""
    return _fused_pre(x, w, scale, bias, H, W, p, c, eps)


def fused_expand_argmax(x, w, scale, bias, head_w, head_b, H: int, W: int,
                        p: int, c: int, n_class: int, eps: float = 1e-5):
    """Fused Dense->LN->fp32 head->argmax (inference only, no VJP):
    (B, N, p²) int32 class ids in pre-shuffle order. Call can_fuse()
    first. The HBM write shrinks from the (B, N, p²c) bf16 activation to
    p² ints per token — no layout copy, no logits materialization."""
    from transception_tpu.ops.pallas import expand_kernel as ek
    return ek.fused_patch_expand_argmax(x, w, scale, bias, head_w, head_b,
                                        H=H, W=W, p=p, c=c, n_class=n_class,
                                        eps=eps)
