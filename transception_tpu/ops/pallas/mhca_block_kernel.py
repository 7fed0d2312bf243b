"""Pallas TPU kernel: one fused MHCABlock forward (networks/MSTr.py:905-946).

CPE (3x3 depthwise + residual) -> LN1 -> FactorAtt(+CRPE) -> residual ->
LN2 -> MixFFN_skip -> residual, for one (path*batch) token map per grid
row, entirely in VMEM.

Why: the r4 b=128 trace put ~29 ms of the 124 ms forward in the MHCA
stage-2/3 token ops, most of it NOT arithmetic: XLA lays these stages out
batch-minor (C=64 half-fills the 128 lanes), lowers the FFN fc dots with
batch-in-lanes *convolution* emitters (1.26 ms for a 9.9 GFLOP fc2 whose
roofline is ~0.3 ms), and re-layouts the hidden stream around every
depthwise conv (0.47 ms x 2 copies per stage-2 layer). Fusing the whole
block makes layouts break only at stage edges — the fix the r4 fold
sweep identified after per-op folds lost to exactly these boundary
copies (core/config.py mhca_ffn_fold note).

Two tricks remove the Mosaic blockers that stopped a whole-block kernel
in r4:

* Per-head factorized attention without lane-dim reshapes: softmax(K) over
  tokens is per-column (no head structure); the per-head context
  K_h^T V_h stack equals the BLOCK DIAGONAL of the full (C, C) Gram
  K^T V, so one MXU dot + a static 0/1 block mask replaces the
  (B, h, N, d) split/merge that Mosaic cannot shape-cast (C -> (h, d)
  splits the lane dim). The off-block elements are wasted FLOPs on a
  64x64-320x320 matrix — noise next to the relayouts they remove.
* CRPE's mixed 3/5/7 windows (MSTr.py:958 {3:2, 5:3, 7:3} heads) as ONE
  7x7 depthwise conv whose weights are host-side zero-padded per channel
  (window-3 head channels have their 3x3 at the center, etc.) — channel
  slicing on the lane dim never happens in-kernel.

The FFN reuses mixffn_kernel._ffn_body in whole-map mode. Numerics follow
the module chain's rounding points (fp32 MXU accumulation, round to the
compute dtype where each flax Dense/Conv emits it); parity is pinned by
tests/test_mhca_block_kernel.py. Requires even map side s (Mosaic rejects
the (s, s, C) <-> (s*s, C) casts at odd s — measured at s=7, so MHCA
stage 4 stays XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transception_tpu.ops.pallas.mixffn_kernel import (
    _VMEM_BUDGET,
    _ffn_body,
    _seg_mean,
)


def eligible_block(x_shape, C: int, heads: int, hidden: int, window,
                   dtype) -> bool:
    """Static gate: square even-side map, head-divisible C, window spec
    covering exactly C channels with odd sizes <= 9, and VMEM fit.
    hidden need not be lane-aligned: Mosaic pads non-128-multiple minor
    dims (the mixffn kernel's stage-2 probes ran hidden=192)."""
    B, N, C_in = x_shape
    s = int(round(N ** 0.5))
    if s * s != N or C_in != C or s % 2 != 0:
        return False
    if C % heads:
        return False
    d = C // heads
    if sum(h for _, h in window) != heads:
        return False
    if any(w % 2 == 0 or w > 9 for w, _ in window):
        return False
    wmax = max(w for w, _ in window)
    return _vmem_need(s, C, hidden, wmax, dtype) <= _VMEM_BUDGET


def _vmem_need(s: int, C: int, hidden: int, wmax: int, dtype) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    return (
        (s + 2) * (s + 2) * C * 4           # CPE pad scratch
        + (s + wmax - 1) * (s + wmax - 1) * C * 4   # CRPE pad scratch
        + (s + 2) * (s + 2) * hidden * 4    # FFN pad scratch
        + s * s * C * itemsize * 6          # x, x1, q, k, v, att residents
        + s * s * hidden * 4                # FFN hidden tile
        + C * (3 * C + 2 * C + 2 * hidden) * itemsize  # weight matrices
    )


def _dwconv_pad(xm, pad_ref, w_ref, b_ref, *, s: int, k: int):
    """k x k depthwise conv via shifted multiply-adds on a zero-padded VMEM
    scratch. xm: (s, s, C); w_ref: (k, k, C); accumulates in the SCRATCH
    dtype (fp32 in production; the bf16taps probe passes a bf16 scratch
    to measure packed-VPU tap throughput) and returns (s, s, C) in that
    dtype, bias added, not rounded. Column shifts hoisted out of the tap
    loop (a column shift is a funnel pass; row shifts slice the untiled
    leading dim for free — mixffn_kernel precedent)."""
    at = pad_ref.dtype
    p = k // 2
    pad_ref[...] = jnp.pad(xm.astype(at), ((p, p), (p, p), (0, 0)))
    w = w_ref[...].astype(at)
    acc = jnp.zeros(xm.shape, at)
    q = pad_ref[...]
    for dj in range(k):
        csh = jax.lax.slice_in_dim(q, dj, dj + s, axis=1)
        for di in range(k):
            sl = jax.lax.slice_in_dim(csh, di, di + s, axis=0)
            acc = acc + sl * w[di, dj][None, None, :]
    return acc + b_ref[...].astype(at)


def _ln(xf, s_ref, b_ref, eps: float, seg: int = 1):
    """fp32 LayerNorm over the minor axis (flax var = E[x^2] - E[x]^2);
    seg > 1 normalizes each lane segment independently (packed rows)."""
    mean = _seg_mean(xf, seg)
    var = _seg_mean(xf * xf, seg) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)


def _kernel(x_ref, cpek_ref, cpeb_ref, l1s_ref, l1b_ref, wq_ref, bq_ref,
            wk_ref, bk_ref, wv_ref, bv_ref, mask_ref, crpek_ref, crpeb_ref,
            wp_ref, bp_ref, l2s_ref, l2b_ref, w1_ref, b1_ref, dw_ref,
            dwb_ref, lns_ref, lnb_ref, w2_ref, b2_ref, o_ref,
            pad3_ref, padw_ref, padh_ref, *, s: int, C: int, hidden: int,
            wmax: int, scale: float, strip: frozenset = frozenset(),
            seg: int = 1):
    dt = o_ref.dtype
    f32 = jnp.float32
    N = s * s
    x = x_ref[0]                                       # (s, s, C) dt

    # --- CPE: 3x3 depthwise + residual (ConvPosEnc) ---
    if "cpe" in strip:                                 # attribution probes
        x1 = x
    else:
        y = _dwconv_pad(x, pad3_ref, cpek_ref, cpeb_ref, s=s, k=3)
        x1 = y.astype(dt) + x                          # conv rounds, add dt
    x1t = x1.reshape(N, C)

    # --- LN1 (eps from caller's norm1; flax returns fp32 -> dt) ---
    cur = _ln(x1t.astype(f32), l1s_ref, l1b_ref, 1e-6, seg).astype(dt)

    # --- QKV (three column slices of the fused qkv Dense) ---
    def dense(t, w_ref, b_ref):
        o = jax.lax.dot_general(
            t, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        return o.astype(dt) + b_ref[...].astype(dt)

    if "attn" in strip:
        x2 = x1t
    else:
        q = dense(cur, wq_ref, bq_ref)                 # (N, C) dt
        k = dense(cur, wk_ref, bk_ref)
        v = dense(cur, wv_ref, bv_ref)

        # --- softmax(K) over tokens, per column (fp32) ---
        kf = k.astype(f32)
        kmax = jnp.max(kf, axis=0, keepdims=True)
        ke = jnp.exp(kf - kmax)
        ks = (ke / jnp.sum(ke, axis=0, keepdims=True)).astype(dt)

        # --- factorized attention via block-diagonal-masked Gram ---
        gram = jax.lax.dot_general(                    # (C, C) fp32
            ks, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        gm = gram.astype(dt) * mask_ref[...]           # zero off-head blocks
        att = jax.lax.dot_general(
            q, gm, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        att = (scale * att).astype(dt)                 # (N, C)

        # --- CRPE: unified wmax x wmax depthwise over V, Hadamard w/ Q ---
        if "crpe" not in strip:
            conv_v = _dwconv_pad(v.reshape(s, s, C), padw_ref,
                                 crpek_ref, crpeb_ref, s=s, k=wmax)
            crpe = q.reshape(s, s, C) * conv_v.astype(dt)
            att = att + crpe.reshape(N, C)

        # --- projection + residual ---
        o = dense(att, wp_ref, bp_ref)
        x2 = x1t + o                                   # (N, C) dt

    # --- LN2 + MixFFN_skip (whole-map _ffn_body) + residual ---
    if "ffn" in strip:
        o_ref[0] = x2.reshape(s, s, C)
        return
    xw = _ln(x2.astype(f32), l2s_ref, l2b_ref, 1e-6, seg).astype(dt)
    ffn = _ffn_body(xw.reshape(s, s, C), w1_ref, b1_ref, dw_ref, dwb_ref,
                    lns_ref, lnb_ref, w2_ref, b2_ref, padh_ref,
                    s=s, rows=s, hidden=hidden, eps=1e-5, off=0, dt=dt, seg=seg)
    out = (ffn.astype(dt).astype(f32)
           + x2.reshape(s, s, C).astype(f32)).astype(dt)
    o_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("s", "heads", "hidden", "window", "interpret",
                              "strip", "pack"))
def fused_mhca_block(x, cpe_k, cpe_b, ln1_s, ln1_b, qkv_k, qkv_b,
                     crpe_ks, crpe_bs, proj_k, proj_b, ln2_s, ln2_b,
                     w1, b1, dw, dwb, ln_s, ln_b, w2, b2, *,
                     s: int, heads: int, hidden: int,
                     window=((3, 2), (5, 3), (7, 3)), interpret=False,
                     strip: frozenset = frozenset(), pack=None):
    """One MHCABlock forward. x: (B, s², C). qkv_k: (C, 3C) fused Dense
    kernel; crpe_ks/crpe_bs: tuples of per-window (w, w, 1, chs)/(chs,)
    params in channel order (head-major — matches ConvRelPosEnc).
    Returns (B, s², C).

    pack=2 (chosen automatically when C half-fills the 128 lanes, B is
    even, and packed VMEM fits) runs TWO batch rows side-by-side in the
    lane dim: x becomes (B/2, N, 2C) with rows b and b+B/2 concatenated
    channel-wise, dense kernels become block-diagonal, per-channel
    weights duplicate, and LayerNorm stats go per-segment (_seg_mean).
    The head-block Gram mask stays the same formula (head blocks of d on
    the 2C diagonal — cross-row products land off-diagonal and are
    masked). All matmul extensions are exact (fp32 accumulation of
    structural zeros), so packed and unpacked kernels differ only by LN
    reduction order. Measured r5: the stage-2 geometry (s=28, C=64) is
    VPU-latency-bound with half the lanes idle; packing ~halves it."""
    B, N, C = x.shape
    dt = x.dtype
    d = C // heads
    wmax = max(w for w, _ in window)

    if pack is None:
        pack = 2 if (2 * C <= 128 and B % 2 == 0 and _vmem_need(
            s, 2 * C, 2 * hidden, wmax, dt) <= _VMEM_BUDGET) else 1

    # Host-side weight prep (traced jnp ops on small params).
    wq, wk, wv = (qkv_k[:, :C], qkv_k[:, C:2 * C], qkv_k[:, 2 * C:])
    bq, bk, bv = (qkv_b[:C], qkv_b[C:2 * C], qkv_b[2 * C:])
    # Unified CRPE weights: zero-pad each window's (w, w, chs) into the
    # center of (wmax, wmax, chs); concat channels head-major.
    segs, bsegs = [], []
    for (w, _h), kern, bias in zip(window, crpe_ks, crpe_bs):
        chs = kern.shape[-1]
        p = (wmax - w) // 2
        segs.append(jnp.pad(kern.reshape(w, w, chs),
                            ((p, p), (p, p), (0, 0))))
        bsegs.append(bias)
    crpe_k = jnp.concatenate(segs, axis=-1)            # (wmax, wmax, C)
    crpe_b = jnp.concatenate(bsegs, axis=-1)
    cpe_k = cpe_k.reshape(3, 3, C)
    dw = dw.reshape(3, 3, hidden)

    B_out, C_out = B, C
    if pack == 2:
        def dup(a):                                    # (..., n) -> (..., 2n)
            return jnp.concatenate([a, a], axis=-1)

        def bdiag(wm):                                 # (a, b) -> (2a, 2b)
            z = jnp.zeros_like(wm)
            return jnp.concatenate(
                [jnp.concatenate([wm, z], 1), jnp.concatenate([z, wm], 1)],
                0)

        x = jnp.concatenate([x[:B // 2], x[B // 2:]], axis=-1)
        wq, wk, wv, proj_k = map(bdiag, (wq, wk, wv, proj_k))
        w1, w2 = bdiag(w1), bdiag(w2)
        (bq, bk, bv, proj_b, ln1_s, ln1_b, ln2_s, ln2_b, cpe_b, cpe_k,
         crpe_k, crpe_b, b2) = map(
            dup, (bq, bk, bv, proj_b, ln1_s, ln1_b, ln2_s, ln2_b, cpe_b,
                  cpe_k, crpe_k, crpe_b, b2))
        b1, dw, dwb, ln_s, ln_b = map(dup, (b1, dw, dwb, ln_s, ln_b))
        B, C, hidden = B // 2, 2 * C, 2 * hidden

    # Block-diagonal head mask (C, C); with pack=2 the same blocks-of-d
    # diagonal also zeroes every cross-row product (|i-j| >= C/2 > d).
    hid = jnp.arange(C, dtype=jnp.int32) // d
    mask = (hid[:, None] == hid[None, :]).astype(dt)

    scale = float(d) ** -0.5
    # bf16taps (probe-only): bf16 tap scratch/accumulation for the CPE
    # and CRPE convs, to measure packed-VPU throughput vs fp32.
    tapdt = jnp.bfloat16 if "bf16taps" in strip else jnp.float32
    vec = lambda a, n: a.reshape(1, n)  # noqa: E731

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, s=s, C=C, hidden=hidden, wmax=wmax,
                          scale=scale, strip=strip, seg=pack),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, s, s, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec((3, 3, C)), spec((1, C)),              # cpe
            spec((1, C)), spec((1, C)),                 # ln1
            spec((C, C)), spec((1, C)),                 # wq bq
            spec((C, C)), spec((1, C)),                 # wk bk
            spec((C, C)), spec((1, C)),                 # wv bv
            spec((C, C)),                               # head mask
            spec((wmax, wmax, C)), spec((1, C)),        # crpe
            spec((C, C)), spec((1, C)),                 # proj
            spec((1, C)), spec((1, C)),                 # ln2
            spec((C, hidden)), spec((1, hidden)),       # fc1
            spec((3, 3, hidden)), spec((1, hidden)),    # ffn dwconv
            spec((1, hidden)), spec((1, hidden)),       # ffn LN
            spec((hidden, C)), spec((1, C)),            # fc2
        ],
        out_specs=pl.BlockSpec((1, s, s, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s, s, C), dt),
        scratch_shapes=[
            pltpu.VMEM((s + 2, s + 2, C), tapdt),
            pltpu.VMEM((s + wmax - 1, s + wmax - 1, C), tapdt),
            pltpu.VMEM((s + 2, s + 2, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * (3 * C + 2 * C + 2 * hidden)
            + B * N * C * (9 + wmax * wmax) * 2
            + B * N * hidden * 9 * 2 + 2 * B * C * C * N,
            bytes_accessed=2 * B * N * C * jnp.dtype(dt).itemsize,
            transcendentals=B * N * (C + hidden),
        ),
        interpret=interpret,
    )(x.reshape(B, s, s, C),
      cpe_k.astype(dt), vec(cpe_b, C),
      vec(ln1_s, C), vec(ln1_b, C),
      wq.astype(dt), vec(bq, C), wk.astype(dt), vec(bk, C),
      wv.astype(dt), vec(bv, C), mask,
      crpe_k.astype(dt), vec(crpe_b, C),
      proj_k.astype(dt), vec(proj_b, C),
      vec(ln2_s, C), vec(ln2_b, C),
      w1.astype(dt), vec(b1, hidden), dw.astype(dt),
      vec(dwb, hidden), vec(ln_s, hidden), vec(ln_b, hidden),
      w2.astype(dt), vec(b2, C))
    out = out.reshape(B, N, C)
    if pack == 2:
        out = jnp.concatenate([out[..., :C_out], out[..., C_out:]], axis=0)
    return out.reshape(B_out, N, C_out)
