"""Dispatch facade for the whole-block fused MHCA kernel.

can_fold_block() is static (platform + shapes) so MHCABlock can decide
which branch owns the flax params before creating them (both branches
create identical param trees). The fused forward carries a custom VJP
whose backward is jax.vjp of _reference_impl — a jnp mirror of the kernel
with the same rounding points — only exercised if gradients flow through
a use_pallas model (training defaults to the XLA path,
core/config.py use_pallas_train).

Why a whole-block kernel (rather than the per-op folds r4 measured as
net losses): XLA lays the MHCA stages out batch-minor, so every
individual kernel's row-major boundary re-imposes relayout copies on its
neighbors. Fusing CPE -> LN1 -> FactorAtt(+CRPE) -> LN2 -> MixFFN_skip
(networks/MSTr.py:905-946) into ONE call makes layouts break only at
stage edges — the fix named by the r4 fold sweep
(core/config.py mhca_ffn_fold note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from transception_tpu.ops.pallas.mixffn import (
    _reference_impl as _mixffn_reference,
    _target_platform,
)


def can_fold_block(x_shape, C: int, heads: int, hidden: int, window,
                   dtype) -> bool:
    if _target_platform() != "tpu":
        return False
    from transception_tpu.ops.pallas import mhca_block_kernel as mbk
    return mbk.eligible_block(x_shape, C, heads, hidden, window, dtype)


def _reference_impl(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b,
                    crpe_ks, crpe_bs, proj_k, proj_b, ln2_s, ln2_b,
                    w1, b1, dw, dwb, ln_s, ln_b, w2, b2,
                    s, heads, hidden, window):
    """jnp mirror of mhca_block_kernel._kernel (same rounding points:
    weights rounded to the compute dtype, fp32 accumulation, dtype
    rounding where each flax Dense/Conv emits it)."""
    B, N, C = x.shape
    dt = x.dtype
    f32 = jnp.float32
    d = C // heads

    def dwconv(xm, kern, bias, k):
        p = k // 2
        y = jax.lax.conv_general_dilated(
            xm.astype(f32), kern.astype(dt).astype(f32), (1, 1),
            ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=xm.shape[-1])
        return y + bias.astype(f32)

    # CPE: 3x3 depthwise + residual.
    xm = x.reshape(B, s, s, C)
    x1 = dwconv(xm, cpe_k.reshape(3, 3, 1, C), cpe_b, 3).astype(dt) + xm
    x1 = x1.reshape(B, N, C)

    def ln(t, sc, bi, eps):
        tf = t.astype(f32)
        mean = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(tf * tf, axis=-1, keepdims=True) - mean * mean
        y = (tf - mean) * jax.lax.rsqrt(var + eps)
        return (y * sc.astype(f32) + bi.astype(f32)).astype(dt)

    cur = ln(x1, ln1_s, ln1_b, 1e-6)

    def dense(t, w, b):
        o = jnp.einsum("bnc,cf->bnf", t, w.astype(dt),
                       preferred_element_type=f32)
        return o.astype(dt) + b.astype(dt)

    q = dense(cur, qkv_k[:, :C], qkv_b[:C])
    k = dense(cur, qkv_k[:, C:2 * C], qkv_b[C:2 * C])
    v = dense(cur, qkv_k[:, 2 * C:], qkv_b[2 * C:])

    # softmax(K) over tokens, per column.
    kf = k.astype(f32)
    ke = jnp.exp(kf - jnp.max(kf, axis=1, keepdims=True))
    ks = (ke / jnp.sum(ke, axis=1, keepdims=True)).astype(dt)

    # Factorized attention via the block-diagonal-masked Gram.
    gram = jnp.einsum("bnc,bnf->bcf", ks, v, preferred_element_type=f32)
    hid = jnp.arange(C, dtype=jnp.int32) // d
    mask = (hid[:, None] == hid[None, :]).astype(dt)
    att = jnp.einsum("bnc,bcf->bnf", q, gram.astype(dt) * mask,
                     preferred_element_type=f32)
    att = (float(d) ** -0.5 * att).astype(dt)

    # CRPE: per-window depthwise over V (head-major channels), Hadamard Q.
    v_img = v.reshape(B, s, s, C)
    outs, start = [], 0
    for (win, _h), kern, bias in zip(window, crpe_ks, crpe_bs):
        chs = kern.shape[-1]
        outs.append(dwconv(v_img[..., start:start + chs],
                           kern.reshape(win, win, 1, chs), bias, win))
        start += chs
    conv_v = jnp.concatenate(outs, axis=-1).astype(dt)
    att = att + (q.reshape(B, s, s, C) * conv_v).reshape(B, N, C)

    # Projection + residual.
    x2 = x1 + dense(att, proj_k, proj_b)

    # LN2 + MixFFN_skip + residual.
    xw = ln(x2, ln2_s, ln2_b, 1e-6)
    ffn = _mixffn_reference(xw, w1, b1, dw.reshape(3, 3, hidden), dwb,
                            ln_s, ln_b, w2, b2, s, hidden, 1e-5)
    return (ffn.astype(f32) + x2.astype(f32)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(21, 22, 23, 24))
def _fused(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b, crpe_ks, crpe_bs,
           proj_k, proj_b, ln2_s, ln2_b, w1, b1, dw, dwb, ln_s, ln_b,
           w2, b2, s, heads, hidden, window):
    from transception_tpu.ops.pallas import mhca_block_kernel as mbk
    return mbk.fused_mhca_block(
        x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b, crpe_ks, crpe_bs,
        proj_k, proj_b, ln2_s, ln2_b, w1, b1, dw, dwb, ln_s, ln_b, w2, b2,
        s=s, heads=heads, hidden=hidden, window=window)


def _fused_fwd(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b, crpe_ks,
               crpe_bs, proj_k, proj_b, ln2_s, ln2_b, w1, b1, dw, dwb,
               ln_s, ln_b, w2, b2, s, heads, hidden, window):
    args = (x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b, crpe_ks, crpe_bs,
            proj_k, proj_b, ln2_s, ln2_b, w1, b1, dw, dwb, ln_s, ln_b,
            w2, b2)
    return _fused(*args, s, heads, hidden, window), args


def _fused_bwd(s, heads, hidden, window, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, s, heads, hidden, window), *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mhca_block_folded(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b,
                            crpe_ks, crpe_bs, proj_k, proj_b, ln2_s, ln2_b,
                            w1, b1, dw, dwb, ln_s, ln_b, w2, b2, *,
                            s: int, heads: int, hidden: int, window):
    """One fused MHCABlock forward (call can_fold_block first).

    x: (B, s², C); qkv_k: (C, 3C); crpe_ks/crpe_bs: per-window
    (w, w, 1, chs)/(chs,) tuples head-major; dw: (3, 3, 1, hidden)."""
    return _fused(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b,
                  tuple(crpe_ks), tuple(crpe_bs), proj_k, proj_b,
                  ln2_s, ln2_b, w1, b1, dw, dwb, ln_s, ln_b, w2, b2,
                  s, heads, hidden, tuple(window))
