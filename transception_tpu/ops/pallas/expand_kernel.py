"""Pallas TPU kernel: fused patch-expand epilogue (Dense + grouped LN)
for FinalPatchExpand_X4 / PatchExpand (MSTr.py:176-227).

At the published shapes the XLA lowering of the decoder head's 4x expand
costs ~16.6 ms of a 144 ms forward (b=128): the (B, 3136, 1024) expansion
is materialized, layout-copied to fp32 for the LN, reduced twice for the
LN stats, normalized, and pixel-shuffled. This kernel fuses the matmul
and the LayerNorm: the (64, p²·c) weight stays resident in VMEM, each
(batch, row-block) tile computes tokens @ W on the MXU (fp32
accumulation, rounded to the compute dtype to match the XLA path), then
LayerNorms each of the p² c-vector groups **without any in-kernel
reshape** — per-group sums come from a second tiny matmul against a
0/1 group-selector matrix (Mosaic cannot shape-cast the lane dim, so
reductions over sub-chunks of the minor axis are expressed as dots).
The normalized (B, N, p²·c) tensor is written once in the compute dtype;
the (cheap, bf16) pixel-shuffle transpose stays in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_rows(H: int, W: int, c: int, p: int, itemsize: int) -> int:
    """Largest row-block (divisor of H, <=8) whose tile fits VMEM and
    satisfies Mosaic's sublane rule (token block divisible by 8, or the
    whole token axis)."""
    for rows in (8, 7, 4, 2, 1):
        if H % rows != 0:
            continue
        if (rows * W) % 8 != 0 and rows != H:
            continue
        toks = rows * W
        feats = c * p * p
        need = (toks * feats * 4 * 2   # fp32 y + one temp
                + toks * feats * itemsize)
        if need <= _VMEM_BUDGET:
            return rows
    # Whole-map fallback: a block covering the entire token axis satisfies
    # the sublane rule trivially (no partial tiles), so maps like H=W=14 —
    # where no small row count divides H with rows*W % 8 == 0 — still fuse
    # when the full map fits VMEM (grid collapses to (B, 1)).
    toks = H * W
    feats = c * p * p
    need = toks * feats * 4 * 2 + toks * feats * itemsize
    if need <= _VMEM_BUDGET:
        return H
    return 0


def eligible(x_shape, H: int, W: int, in_c: int, out_c: int, p: int,
             dtype) -> bool:
    """Gate on the caller's REAL (H, W) — not sqrt(N), which would wrongly
    admit a non-square map whose N happens to be a perfect square
    (ADVICE r2)."""
    B, N, C = x_shape
    if H != W or H * W != N or C != in_c:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    w_bytes = in_c * p * p * out_c * itemsize
    if w_bytes > 4 * 1024 * 1024:
        return False
    return _pick_rows(H, W, out_c, p, itemsize) > 0


def _kernel(x_ref, w_ref, g_ref, gt_ref, scale_ref, bias_ref, o_ref, *,
            c: int, eps: float):
    x = x_ref[0]                          # (toks, C)
    w = w_ref[...]                        # (C, p²c)
    y = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # Round like the XLA path (Dense outputs compute dtype pre-LN).
    y = y.astype(x.dtype).astype(jnp.float32)
    g = g_ref[...]                        # (p²c, p²) group selector
    gt = gt_ref[...]                      # (p², p²c) broadcast-back
    s = jax.lax.dot_general(              # per-group sums (toks, p²)
        y, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sq = jax.lax.dot_general(
        y * y, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mean = s / c
    var = sq / c - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_b = jax.lax.dot_general(
        mean, gt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    inv_b = jax.lax.dot_general(
        inv, gt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yn = (y - mean_b) * inv_b * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    o_ref[0] = yn.astype(o_ref.dtype)


def _head_kernel(x_ref, w_ref, g_ref, gt_ref, scale_ref, bias_ref,
                 hw_ref, hb_ref, o_ref, *, c: int, eps: float):
    """Expand + grouped LN (as _kernel) + per-group 1x1 head — all in
    VMEM, emitting the per-group class logits (toks, p²·n_class).  The
    head is one dot against a block-diagonal (p²c, p²·n_class) weight:
    zero FLOPs wasted on the MXU are cheaper than any lane reshape,
    which Mosaic cannot do.  The argmax stays in XLA (a cheap minor-dim
    reduce of the small logits tensor): extracting per-class columns
    in-kernel needs n_class 0/1 selector dots whose 16-wide outputs each
    pad to 128 MXU lanes — measured +1.8 ms/call at b=128.  (A per-group
    formulation with groups on the weight's leading axis and native
    minor-dim LN reduces was also measured: 39 ms — narrow-lane VPU work
    is far worse than padded-MXU work at these shapes.)

    The head dot runs in the compute dtype with fp32 accumulation: an
    fp32xfp32 MXU dot here was measured at +1.6 ms/call — the v5e runs
    fp32 matmuls ~8x slower than bf16 — so the head weight is rounded to
    the compute dtype (bf16 products are exact in fp32; only the weight
    rounding, ~2^-9 relative, can flip argmax near-ties; this path is
    bf16-only, the fp32 protocol eval keeps XLA's conv+argmax)."""
    x = x_ref[0]
    w = w_ref[...]
    y = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).astype(jnp.float32)
    g = g_ref[...]
    gt = gt_ref[...]
    s = jax.lax.dot_general(
        y, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sq = jax.lax.dot_general(
        y * y, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mean = s / c
    var = sq / c - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_b = jax.lax.dot_general(
        mean, gt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    inv_b = jax.lax.dot_general(
        inv, gt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    yn = (y - mean_b) * inv_b * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    yb = yn.astype(x.dtype)
    logits = jax.lax.dot_general(              # (toks, p²·n_class)
        yb, hw_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + hb_ref[...]
    o_ref[0] = logits.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "p", "c", "n_class", "eps",
                                    "interpret"))
def fused_patch_expand_argmax(x, w, scale, bias, head_w, head_b, *, H: int,
                              W: int, p: int, c: int, n_class: int,
                              eps: float = 1e-5, interpret: bool = False):
    """Dense(expand) -> grouped LN -> per-group 1x1 head -> argmax,
    one kernel. x: (B, H*W, C); head_w: (c, n_class); head_b: (n_class,).
    Returns (B, H*W, p²) int32 class ids in PRE-shuffle order — the HBM
    write shrinks from the (B, N, p²c) activation to p² ints/token.
    Accumulation-order caveat: the head dot is a different (but still
    fp32-MXU) contraction than XLA's conv, so exact argmax ties at fp32
    resolution may differ; everything else matches the XLA path's
    rounding."""
    B, N, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = _pick_rows(H, W, c, p, itemsize)
    if rows == 0:
        raise NotImplementedError("no row tiling fits VMEM")
    feats = p * p * c
    groups = p * p
    G = groups * n_class
    wd = w.astype(x.dtype)
    gsel = (jnp.arange(feats) // c)[:, None] == jnp.arange(groups)[None, :]
    gsel = gsel.astype(jnp.float32)
    gbk = gsel.T
    scale_t = jnp.tile(scale.astype(jnp.float32), groups)[None, :]
    bias_t = jnp.tile(bias.astype(jnp.float32), groups)[None, :]
    # Block-diagonal head: (p²c, p²·n_class), group-major columns —
    # bd[g·c + i, g·n_class + k] = head_w[i, k].
    eye_g = jnp.eye(groups, dtype=jnp.float32)
    bd = jnp.einsum("gh,ik->gihk", eye_g, head_w.astype(jnp.float32))
    bd = bd.reshape(feats, G).astype(x.dtype)
    hb_t = jnp.tile(head_b.astype(jnp.float32), groups)[None, :]

    logits = pl.pallas_call(
        functools.partial(_head_kernel, c=c, eps=eps),
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec((1, rows * W, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, G), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * W, G), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, G), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * feats + 2 * B * N * feats * G,
            bytes_accessed=(B * N * C * itemsize + B * N * G * itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wd, gsel, gbk, scale_t, bias_t, bd, hb_t)
    # Argmax in XLA: a minor-dim reduce over the small logits tensor
    # (group-major columns -> (groups, n_class) reshape is exact).  The
    # logits are written in the compute dtype: in bf16 that rounds before
    # the compare, one more source of near-tie flips on the (bf16-only)
    # fast path.
    return jnp.argmax(logits.reshape(B, N, groups, n_class),
                      axis=-1).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "p", "c", "eps", "interpret"))
def fused_patch_expand(x, w, scale, bias, *, H: int, W: int, p: int,
                       c: int, eps: float = 1e-5, interpret: bool = False):
    """x: (B, H*W, C); w: (C, p²·c); scale/bias: (c,) LN affine.
    Returns the LayerNormed expansion (B, H*W, p²·c) — pre-shuffle; the
    caller applies the pixel-shuffle rearrange (bf16, cheap in XLA)."""
    B, N, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = _pick_rows(H, W, c, p, itemsize)
    if rows == 0:
        raise NotImplementedError("no row tiling fits VMEM")
    feats = p * p * c
    wd = w.astype(x.dtype)
    groups = p * p
    gsel = (jnp.arange(feats) // c)[:, None] == jnp.arange(groups)[None, :]
    gsel = gsel.astype(jnp.float32)                 # (p²c, p²)
    gbk = gsel.T                                    # (p², p²c)
    # 2-D (1, feats): Mosaic's 1-D fp32 tiling rejects lengths that are
    # not tile-aligned (observed at feats=640); a (1, N) operand with N a
    # multiple of 128 lanes always lowers, and broadcasts in the kernel.
    scale_t = jnp.tile(scale.astype(jnp.float32), groups)[None, :]
    bias_t = jnp.tile(bias.astype(jnp.float32), groups)[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, c=c, eps=eps),
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec((1, rows * W, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * W, feats), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, feats), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * feats,
            bytes_accessed=(B * N * C + B * N * feats) * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wd, gsel, gbk, scale_t, bias_t)
    return out
