"""Dispatch facade for the fused MixFFN_skip kernel.

can_fuse() is static (platform + shapes) so the module can decide which
branch owns the flax params before creating them (both branches create
identical param trees). The fused forward carries a custom VJP whose
backward is jax.vjp of a reference jnp implementation — only exercised
if gradients flow through a use_pallas model (training defaults to the
XLA path, core/config.py use_pallas_train).
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


def can_fuse(x_shape, H: int, W: int, hidden: int, dtype) -> bool:
    if H != W or _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import mixffn_kernel as mk
    return mk.eligible(x_shape, x_shape[-1], hidden, dtype)


def _reference_impl(x, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden, eps):
    """jnp mirror of ops/common.py MixFFNSkip (for the VJP)."""
    B, N, C = x.shape
    dt = x.dtype
    h = (jnp.einsum("bnc,ch->bnh", x, w1.astype(dt),
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(dt)
    hm = h.reshape(B, s, s, hidden)
    # Conv inputs upcast to fp32 instead of preferred_element_type: the
    # conv transpose rule rejects a (bf16 operand, fp32 cotangent) pair,
    # which broke the VJP the first time gradients actually flowed
    # through a use_pallas model (caught by the 500-epoch recipe run).
    # Numerics identical: bf16 values are exact in fp32 and accumulation
    # was already fp32.
    d = jax.lax.conv_general_dilated(
        hm.astype(jnp.float32),
        dw.reshape(3, 3, 1, hidden).astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=hidden)
    d = (d + dwb.astype(jnp.float32)).astype(dt).reshape(B, N, hidden)
    # Skip-add in fp32 on the *rounded* terms — exactly what the kernel
    # computes (mixffn_kernel.py:102) — so the VJP differentiates the same
    # function the fused forward evaluated (ADVICE r2).
    y = d.astype(jnp.float32) + h.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(y * y, axis=-1, keepdims=True) - mean * mean
    a = (y - mean) * jax.lax.rsqrt(var + eps)
    a = (a * ls.astype(jnp.float32) + lb.astype(jnp.float32)).astype(dt)
    a = jax.nn.gelu(a.astype(jnp.float32), approximate=False).astype(dt)
    out = (jnp.einsum("bnh,hc->bnc", a, w2.astype(dt),
                      preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32)).astype(dt)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused(x, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden, eps):
    from transception_tpu.ops.pallas import mixffn_kernel as mk
    return mk.fused_mixffn_skip(x, w1, b1, dw, dwb, ls, lb, w2, b2,
                                s=s, hidden=hidden, eps=eps)


def _fused_fwd(x, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden, eps):
    args = (x, w1, b1, dw, dwb, ls, lb, w2, b2)
    return _fused(*args, s, hidden, eps), args


def _fused_bwd(s, hidden, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, s, hidden, eps), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mixffn(x, w1, b1, dw, dwb, ls, lb, w2, b2, s: int, hidden: int,
                 eps: float = 1e-5):
    """Fused fc1 -> dwconv+skip -> LN -> gelu -> fc2; call can_fuse first."""
    return _fused(x, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden, eps)


# ---- LN+residual-folded variant (bridge norm2 + post-FFN residual) ----

def can_fuse_ln(x_shape, H: int, W: int, hidden: int, groups: int,
                dtype) -> bool:
    if H != W or _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import mixffn_kernel as mk
    return mk.eligible_ln(x_shape, x_shape[-1], hidden, groups, dtype)


def group_ln(x, lts, ltb, groups: int, eps: float = 1e-5):
    """Grouped LayerNorm on the wide (B, N, C) layout: every C-wide row
    holds `groups` tokens of width C/groups, each normalized
    independently — exactly the bridge's norm2 (a plain LN on the
    (B, N·groups, C/groups) stream view) evaluated without leaving the
    per-scale wide layout. lts/ltb are the (C,)-tiled scale/bias."""
    B, N, C = x.shape
    dt = x.dtype
    g = C // groups
    xr = x.astype(jnp.float32).reshape(B, N, groups, g)
    mean = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.mean(xr * xr, axis=-1, keepdims=True) - mean * mean
    xn = ((xr - mean) * jax.lax.rsqrt(var + eps)).reshape(B, N, C)
    return (xn * lts.astype(jnp.float32)
            + ltb.astype(jnp.float32)).astype(dt)


def _reference_impl_ln(x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2,
                       s, hidden, groups, eps_ln, eps):
    """jnp mirror of the folded kernel: x + mixffn(groupLN(x))."""
    xn = group_ln(x, lts, ltb, groups, eps_ln)
    out = _reference_impl(xn, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden,
                          eps)
    return (out.astype(jnp.float32) + x.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _fused_ln(x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden,
              groups, eps_ln, eps):
    from transception_tpu.ops.pallas import mixffn_kernel as mk
    return mk.fused_mixffn_ln_skip(x, lts, ltb, w1, b1, dw, dwb, ls, lb,
                                   w2, b2, s=s, hidden=hidden,
                                   groups=groups, eps_ln=eps_ln, eps=eps)


def _fused_ln_fwd(x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2, s, hidden,
                  groups, eps_ln, eps):
    args = (x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2)
    return _fused_ln(*args, s, hidden, groups, eps_ln, eps), args


def _fused_ln_bwd(s, hidden, groups, eps_ln, eps, res, g):
    # Flash-style Pallas backward where eligible: recompute-in-VMEM per
    # row tile, weight grads accumulated on-chip — the hidden stream
    # never touches HBM (mixffn_kernel._bwd_kernel_ln). Ineligible
    # shapes (odd map sides) fall back to jax.vjp of the jnp mirror,
    # which recomputes through HBM (the r2 custom-VJP cost).
    x = res[0]
    if _target_platform() == "tpu":
        from transception_tpu.ops.pallas import mixffn_kernel as mk
        if mk.eligible_ln_bwd(x.shape, x.shape[-1], hidden, groups,
                              x.dtype):
            return mk.fused_mixffn_ln_skip_bwd(
                *res, g, s=s, hidden=hidden, groups=groups,
                eps_ln=eps_ln, eps=eps)
    _, vjp = jax.vjp(
        lambda *a: _reference_impl_ln(*a, s, hidden, groups, eps_ln, eps),
        *res)
    return vjp(g)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_mixffn_ln(x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2, s: int,
                    hidden: int, groups: int, eps_ln: float = 1e-5,
                    eps: float = 1e-5):
    """Folded x + mixffn(groupLN(x)); call can_fuse_ln first."""
    return _fused_ln(x, lts, ltb, w1, b1, dw, dwb, ls, lb, w2, b2,
                     s, hidden, groups, eps_ln, eps)
