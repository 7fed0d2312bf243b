"""Pallas TPU kernel: fully fused MixFFN_skip
(fc1 -> DWConv3x3 + fc1-skip -> LN -> GELU -> fc2, MSTr.py:889-902).

The bridge runs 16 of these per forward (4 layers x 4 scales) and XLA's
lowering materializes the 4x hidden state several times in HBM (fc1 out,
dwconv out, LN/GELU out) — measured 6.1 ms/layer at ~508 GB/s, the
largest remaining cost of the b=128 forward. This kernel keeps the whole
per-batch (s², C) token map resident in VMEM (the BlockSpec index map is
constant in the row-tile axis, so it is fetched once per batch) and
streams row-tiles of the hidden state: fc1 is recomputed over a one-row
halo window instead of exchanged, the depthwise 3x3 conv is nine shifted
multiply-adds on the zero-padded window (the window is clamped so its
pad rows coincide exactly with the map's true edges — no masks needed),
LN reduces over the (minor) hidden axis, and only the final C-wide fc2
output is written back. HBM traffic per call: read x once + write out
once.

Matmuls accumulate fp32 on the MXU and round to the compute dtype at the
same points as the XLA path (each flax Dense/Conv emits the compute
dtype), so numerics match within bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_rows(s: int, C: int, hidden: int, itemsize: int,
               whole_map: bool = True) -> int:
    """Row-tile height < s (>=2 tiles so window clamping is well-defined),
    dividing s, with (rows*s) % 8 == 0 (Mosaic sublane rule) and the
    padded fp32 window fitting VMEM. Falls back to rows == s (whole map
    per grid step, no halo windows — the kernels branch statically) for
    the small maps where no partial tiling satisfies the sublane rule
    (s = 14: the MHCA stage-3 and decoder_2 geometries). whole_map=False
    (the eligible() auto-gate) excludes that fallback: in the full graph
    the 14² instances measured as small LOSSES (decoder_2 ETB fold
    ~+0.6 ms b=128; the kernel's row-major boundary forces relayout
    copies in a region XLA lays out batch-minor), so auto paths keep XLA
    there. Note the mhca_ffn_fold knob ALSO routes through the auto-gate
    (MHCABlock -> MixFFNSkip -> can_fuse_ln -> eligible(whole_map=False)),
    so at s=14 it silently falls back to the XLA chain: the knob engages
    the kernel only at partial-tiling geometries (s=28); whole-map mode is
    reachable only by direct kernel calls and tests (ADVICE r4)."""
    for rows in (28, 14, 8, 7, 4, 2, 1):
        if rows >= s or s % rows != 0:
            continue
        if (rows * s) % 8 != 0:
            continue
        win = (rows + 4) * (s + 2) * hidden
        need = (win * 4 * 2                  # fp32 window + conv acc
                + s * s * C * itemsize       # resident input map
                + (C + 8) * hidden * itemsize * 2)  # w1, w2ᵀ
        if need <= _VMEM_BUDGET:
            return rows
    # odd s: Mosaic rejects the (s, s, C)->(s², C) cast the fc dots need
    if whole_map and s % 2 == 0:
        win = (s + 2) * (s + 2) * hidden
        need = (win * 4 * 2 + s * s * C * itemsize
                + (C + 8) * hidden * itemsize * 2)
        if need <= _VMEM_BUDGET:
            return s
    return 0


def eligible(x_shape, C: int, hidden: int, dtype) -> bool:
    B, N, C_in = x_shape
    s = int(round(N ** 0.5))
    if s * s != N or C_in != C:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _pick_rows(s, C, hidden, itemsize, whole_map=False) > 0


def eligible_ln(x_shape, C: int, hidden: int, groups: int, dtype) -> bool:
    """Gate for the LN+residual-folded variant: same geometry as
    eligible() plus the (rows+2, s, C) fp32 group-LN temporaries (small
    next to the hidden window — C = hidden/4)."""
    if groups < 1 or C % groups:
        return False
    return eligible(x_shape, C, hidden, dtype)


def _seg_mean(xf, seg: int):
    """Per-segment mean over the minor axis, broadcast back to xf's shape.

    seg == 1 is the plain mean. seg == 2 (the lane-packed kernel: two
    batch rows side-by-side in the lane dim) uses the sum/difference
    trick: S = sum over all lanes, D = signed sum (+1 first half, -1
    second), so seg1 = (S+D)/2 and seg2 = (S-D)/2 — two full-lane VPU
    reductions and a lane-indexed select, with no (C, C) selector-matmul
    operands."""
    if seg == 1:
        return jnp.mean(xf, axis=-1, keepdims=True)
    width = xf.shape[-1]
    half = width // 2
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (xf.ndim - 1) + (width,), xf.ndim - 1)
    sgn = jnp.where(lane < half, 1.0, -1.0)
    s_all = jnp.sum(xf, axis=-1, keepdims=True)
    d_all = jnp.sum(xf * sgn, axis=-1, keepdims=True)
    m1 = (s_all + d_all) / (2.0 * half)
    m2 = (s_all - d_all) / (2.0 * half)
    return jnp.where(lane < half, m1, m2)


def _seg_max(xf, seg: int):
    """Per-segment max over the minor axis (broadcast back). seg == 2:
    two where-masked full-lane max reductions + a lane select (max has no
    sum/difference shortcut)."""
    if seg == 1:
        return jnp.max(xf, axis=-1, keepdims=True)
    width = xf.shape[-1]
    half = width // 2
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (xf.ndim - 1) + (width,), xf.ndim - 1)
    lo = lane < half
    neg = jnp.float32(-3.4e38)
    m1 = jnp.max(jnp.where(lo, xf, neg), axis=-1, keepdims=True)
    m2 = jnp.max(jnp.where(lo, neg, xf), axis=-1, keepdims=True)
    return jnp.where(lo, m1, m2)


def _ffn_body(xw, w1_ref, b1_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
              w2_ref, b2_ref, hp_ref, *, s: int, rows: int, hidden: int,
              eps: float, off, dt, seg: int = 1):
    """fc1 -> dwconv+skip -> LN -> GELU -> fc2 on one compute-dtype halo
    window xw (R, s, C); returns the fp32 (rows, s, C_out) tile (shared by
    the plain kernel and the LN+residual-folded variant).

    Vector params arrive as (1, n) 2-D refs (not (n,)): under jax.vmap
    (the path-stacked MHCA encoders batch per-path weights) a batched
    1-D operand's (1, n) block fails Mosaic's last-two-dims rule, while
    (1, 1, n) blocks of a (P, 1, n) array pass; broadcasting against the
    (R, s, ·) tiles is identical. rows == s means whole-map mode: xw is
    the full unpadded map and the conv halo comes solely from the
    in-kernel zero pad. Whole-map requires even s: at s=7 Mosaic's
    infer-vector-layout rejects the (7, 7, C) -> (49, C) shape cast the
    fc1 dot needs (measured on v5e; s=14's (196, C) cast lowers fine)."""
    h = jax.lax.dot_general(
        xw, w1_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = h.astype(dt).astype(jnp.float32)                 # Dense rounding
    hm = h                                               # (R, s, hidden)

    # Zero-pad one row top+bottom and one col left+right into the VMEM
    # scratch (dynamic ds indexing is only lowered on refs): with the
    # clamped window, a pad row is read exactly when the conv window
    # crosses the map's true edge (off==0 at the top tile, off==2 at the
    # bottom tile), reproducing conv zero padding with no masks.
    hp_ref[...] = jnp.pad(hm, ((1, 1), (1, 1), (0, 0)))
    dw = dw_ref[...].astype(jnp.float32)                 # (3, 3, hidden)
    acc = jnp.zeros((rows, s, hidden), jnp.float32)
    # One dynamic row-window load, then hoist the 3 column shifts out of
    # the tap loop: a dj column shift is a sublane-misaligned slice
    # (a funnel-shift pass over the whole window on the VPU), while a
    # row shift slices the non-tiled leading dim for free — 3 shift
    # passes instead of 9.
    q = hp_ref[pl.ds(off, rows + 2)]                     # (rows+2, s+2, ·)
    h_t = None
    for dj in range(3):
        csh = jax.lax.slice_in_dim(q, dj, dj + s, axis=1)
        if dj == 1:
            h_t = jax.lax.slice_in_dim(csh, 1, 1 + rows, axis=0)
        for di in range(3):
            sl = jax.lax.slice_in_dim(csh, di, di + rows, axis=0)
            acc = acc + sl * dw[di, dj][None, None, :]
    d = acc + dwb_ref[...].astype(jnp.float32)
    d = d.astype(dt).astype(jnp.float32)                 # Conv rounding

    y = d + h_t.astype(dt).astype(jnp.float32)           # (rows, s, hidden)
    mean = _seg_mean(y, seg)
    var = _seg_mean(y * y, seg) - mean * mean
    a = (y - mean) * jax.lax.rsqrt(var + eps)
    a = a * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    a = a.astype(dt)                                     # LN output dtype
    # erf-GELU. Mosaic has no erf/erfc lowering, so erf is evaluated with
    # the Abramowitz-Stegun 7.1.26 rational polynomial (max abs error
    # 1.5e-7 — far below the bf16 output rounding of the XLA path's
    # exact-erf GELU).
    af = a.astype(jnp.float32)
    z = af * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_abs
    a = (0.5 * af * (1.0 + erf_z)).astype(dt)

    return jax.lax.dot_general(
        a, w2_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + b2_ref[...].astype(jnp.float32)


def _window(j: int, rows: int, s: int):
    """Clamped halo window [start, start+rows+2) and the in-window offset
    of the target rows."""
    r0 = j * rows
    start = jnp.clip(r0 - 1, 0, s - (rows + 2))
    return r0, start, r0 - start


def _kernel(x_ref, w1_ref, b1_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
            w2_ref, b2_ref, o_ref, hp_ref, *, s: int, rows: int,
            hidden: int, eps: float):
    dt = o_ref.dtype
    if rows == s:                                        # whole-map mode
        off = 0
        xw = x_ref[0]                                    # (s, s, C)
    else:
        _, start, off = _window(pl.program_id(1), rows, s)
        # x is laid out (1, s, s, C); slicing whole rows on dim 1 keeps
        # the dynamic index off the tiled (sublane/lane) dims, which
        # Mosaic requires to be statically 8-aligned otherwise. All
        # computation stays in (rows, cols, feature) 3-D form — Mosaic
        # cannot shape-cast across the tiled dims.
        xw = x_ref[0, pl.ds(start, rows + 2), :, :]      # (R, s, C)
    out = _ffn_body(xw, w1_ref, b1_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
                    w2_ref, b2_ref, hp_ref, s=s, rows=rows, hidden=hidden,
                    eps=eps, off=off, dt=dt)
    o_ref[0] = out.astype(dt)


def _kernel_ln(x_ref, sel_ref, selt_ref, lts_ref, ltb_ref, w1_ref, b1_ref,
               dw_ref, dwb_ref, ls_ref, lb_ref, w2_ref, b2_ref, o_ref,
               hp_ref, *, s: int, rows: int, hidden: int, groups: int,
               eps_ln: float, eps: float):
    """LN+residual-folded variant: the input map is PRE-norm (the bridge
    layer's tx1 = inputs + attn, MSTr.py:2402-2407); the bridge's norm2 is
    applied in-kernel as a grouped LayerNorm — each s²-token row of the
    wide (s², C·mult) layout holds `groups` bridge tokens of width
    C = dim, normalized independently (group stats via 0/1 selector dots:
    Mosaic cannot shape-cast the lane dim) — and the layer's post-FFN
    residual (+tx1) is added before the single HBM write. Removes the
    full-stream norm2 pass and the separate residual add from XLA."""
    dt = o_ref.dtype
    f32 = jnp.float32
    if rows == s:                                        # whole-map mode
        r0, off = 0, 0
        xraw = x_ref[0]                                  # (s, s, C) dt
    else:
        r0, start, off = _window(pl.program_id(1), rows, s)
        xraw = x_ref[0, pl.ds(start, rows + 2), :, :]    # (R, s, C) dt
    xf = xraw.astype(f32)
    gsz = (xf.shape[-1]) // groups
    ssum = jax.lax.dot_general(                          # (R, s, groups)
        xf, sel_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)
    ssq = jax.lax.dot_general(
        xf * xf, sel_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)
    mean = ssum / gsz
    inv = jax.lax.rsqrt(ssq / gsz - mean * mean + eps_ln)
    mean_b = jax.lax.dot_general(                        # (R, s, C)
        mean, selt_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)
    inv_b = jax.lax.dot_general(
        inv, selt_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)
    xn = (xf - mean_b) * inv_b * lts_ref[...].astype(f32) \
        + ltb_ref[...].astype(f32)
    xw = xn.astype(dt)                                   # LN output dtype
    out = _ffn_body(xw, w1_ref, b1_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
                    w2_ref, b2_ref, hp_ref, s=s, rows=rows, hidden=hidden,
                    eps=eps, off=off, dt=dt)
    # Residual on the raw (pre-norm) rows — re-read from the resident ref
    # (dynamic starts only lower on refs); fc2 rounds to dt first so the
    # sum matches XLA's bf16 `tx1 + concat(ffn)` add bit pattern.
    xt = x_ref[0, pl.ds(r0, rows), :, :].astype(f32)
    o_ref[0] = (out.astype(dt).astype(f32) + xt).astype(dt)


@functools.partial(
    jax.jit, static_argnames=("s", "hidden", "eps", "interpret"))
def fused_mixffn_skip(x, w1, b1, dw, dwb, ln_scale, ln_bias, w2, b2, *,
                      s: int, hidden: int, eps: float = 1e-5,
                      interpret: bool = False):
    """x: (B, s², C); w1: (C, hidden); dw: (3, 3, hidden) depthwise;
    w2: (hidden, C). Returns (B, s², C) = fc2(gelu(LN(dwconv(fc1(x)) +
    fc1(x))))."""
    B, N, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = _pick_rows(s, C, hidden, itemsize)
    if rows == 0:
        raise NotImplementedError("no row tiling fits")

    out = pl.pallas_call(
        functools.partial(_kernel, s=s, rows=rows, hidden=hidden, eps=eps),
        grid=(B, s // rows),
        in_specs=[
            # Full map per batch; constant in j => fetched once per batch.
            pl.BlockSpec((1, s, s, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, hidden), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, s, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s, s, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + (2 if rows == s else 4), s + 2, hidden),
                       jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * hidden * 2 + B * N * hidden * 9 * 2,
            bytes_accessed=2 * B * N * C * itemsize,
            transcendentals=B * N * hidden,
        ),
        interpret=interpret,
    )(x.reshape(B, s, s, C), w1.astype(x.dtype), b1.reshape(1, hidden),
      dw.astype(x.dtype), dwb.reshape(1, hidden), ln_scale.reshape(1, hidden),
      ln_bias.reshape(1, hidden), w2.astype(x.dtype), b2.reshape(1, C))
    return out.reshape(B, N, C)


@functools.partial(
    jax.jit, static_argnames=("s", "hidden", "groups", "eps_ln", "eps",
                              "interpret"))
def fused_mixffn_ln_skip(x, lts, ltb, w1, b1, dw, dwb, ln_scale, ln_bias,
                         w2, b2, *, s: int, hidden: int, groups: int,
                         eps_ln: float = 1e-5, eps: float = 1e-5,
                         interpret: bool = False):
    """LN+residual-folded MixFFN_skip: x is the PRE-norm (B, s², C) wide
    map; lts/ltb are the bridge norm2 scale/bias pre-tiled to (C,)
    (C = groups · bridge_dim). Returns x + mixffn(groupLN(x)) — one HBM
    read of x, one write, no full-stream norm2 pass or separate residual
    add in XLA (see _kernel_ln)."""
    B, N, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = _pick_rows(s, C, hidden, itemsize)
    if rows == 0 or C % groups:
        raise NotImplementedError("no row tiling fits")
    f32 = jnp.float32
    gsz = C // groups
    gid = jnp.arange(C, dtype=jnp.int32) // gsz
    sel = (gid[:, None] == jnp.arange(groups)[None, :]).astype(f32)

    out = pl.pallas_call(
        functools.partial(_kernel_ln, s=s, rows=rows, hidden=hidden,
                          groups=groups, eps_ln=eps_ln, eps=eps),
        grid=(B, s // rows),
        in_specs=[
            pl.BlockSpec((1, s, s, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, groups), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            # lts/ltb ship (1, C) not (C,): this fold is device-unverified
            # and Mosaic's 1-D fp32 tiling rejects some non-tile-aligned
            # lengths (observed at 640 in expand_kernel); broadcasting
            # against the (R, s, C) LN output is identical.
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, hidden), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, s, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s, s, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + (2 if rows == s else 4), s + 2, hidden),
                       jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * hidden * 2 + B * N * hidden * 9 * 2,
            bytes_accessed=2 * B * N * C * itemsize,
            transcendentals=B * N * hidden,
        ),
        interpret=interpret,
    )(x.reshape(B, s, s, C), sel, sel.T, lts.reshape(1, C),
      ltb.reshape(1, C),
      w1.astype(x.dtype), b1.reshape(1, hidden), dw.astype(x.dtype),
      dwb.reshape(1, hidden), ln_scale.reshape(1, hidden),
      ln_bias.reshape(1, hidden), w2.astype(x.dtype), b2.reshape(1, C))
    return out.reshape(B, N, C)


# ---- Flash-style Pallas BACKWARD for the LN+residual-folded variant ----
#
# The r2 custom-VJP backwards (jax.vjp of the jnp reference) lose to XLA's
# joint fwd+bwd because they recompute the 4x hidden stream THROUGH HBM.
# This kernel is the flash pattern the bridge-attention backward proved
# (bridge_attention_kernel._bwd_kernel): recompute the forward
# intermediates per row-tile in VMEM from the resident C-wide x, emit the
# C-wide dx tile, and accumulate every weight gradient in fp32 VMEM
# across the sequential (B, n_tiles) grid — HBM sees x and g once each
# and dx once; the hidden-width stream never leaves the chip.

_VMEM_BUDGET_BWD = 12 * 1024 * 1024
_GELU_C = 0.3989422804014327  # 1/sqrt(2*pi)


def _pick_rows_bwd(s: int, C: int, hidden: int, itemsize: int) -> int:
    """Backward row tile: the window needs a TWO-row halo (dx at row r
    needs dd at r±1, which needs y/h at r±2), so W = rows + 4 clamped to
    the map; ~6 (W, s, hidden) fp32 temporaries live at once plus the two
    padded conv scratches. Even s only (the weight-grad dots collapse
    (W, s, ·) -> (W·s, ·), the shape cast Mosaic rejects at odd s)."""
    if s % 2:
        return 0
    for rows in (28, 14, 8, 4, 2):
        if rows >= s or s % rows:
            continue
        if (rows * s) % 8:
            continue
        W = rows + 4
        need = (2 * (W + 2) * (s + 2) * hidden * 4
                + 6 * W * s * hidden * 4 + 2 * W * s * C * 4
                + (C + 8) * hidden * itemsize * 2)
        if need <= _VMEM_BUDGET_BWD:
            return rows
    need = (2 * (s + 2) * (s + 2) * hidden * 4
            + 6 * s * s * hidden * 4 + 2 * s * s * C * 4)
    if need <= _VMEM_BUDGET_BWD:
        return s
    return 0


def eligible_ln_bwd(x_shape, C: int, hidden: int, groups: int,
                    dtype) -> bool:
    if groups < 1 or C % groups:
        return False
    B, N, C_in = x_shape
    s = int(round(N ** 0.5))
    if s * s != N or C_in != C:
        return False
    return _pick_rows_bwd(s, C, hidden, jnp.dtype(dtype).itemsize) > 0


def _erf(z):
    """Abramowitz-Stegun 7.1.26 rational erf (no Mosaic erf lowering);
    max abs error 1.5e-7 (same approximation as the forward's GELU)."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def _bwd_kernel_ln(x_ref, g_ref, sel_ref, selt_ref, lts_ref, ltb_ref,
                   w1_ref, b1_ref, dw_ref, dwb_ref, ls_ref, lb_ref,
                   w2_ref,
                   dx_ref, dlts_ref, dltb_ref, dw1_ref, db1_ref, ddw_ref,
                   ddwb_ref, dls_ref, dlb_ref, dw2_ref, db2_ref,
                   hp_ref, dp_ref, *, s: int, rows: int, hidden: int,
                   groups: int, eps_ln: float, eps: float):
    """One (batch row, row-tile) backward step of
    out = x + mixffn(groupLN(x)). See module comment; gradient chain
    mirrors jax.vjp of mixffn._reference_impl_ln (fp32 everywhere, the
    dtype casts are pass-through)."""
    f32 = jnp.float32
    dt = dx_ref.dtype
    j = pl.program_id(1)
    if rows == s:                                      # whole-map mode
        W = s
        r0 = off = 0
        start = 0
    else:
        W = rows + 4
        r0 = j * rows
        start = jnp.clip(r0 - 2, 0, s - W)
        off = r0 - start

    xw = x_ref[0, pl.ds(start, W)]                     # (W, s, C) dt
    gw = g_ref[0, pl.ds(start, W)]
    xf = xw.astype(f32)
    gf = gw.astype(f32)
    C = xf.shape[-1]
    gz = float(C // groups)

    def dot3(a, b):                                    # (.., k)·(k, m)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- forward recompute: groupLN (selector-dot stats) ----
    sel = sel_ref[...]
    selt = selt_ref[...]
    mu = dot3(xf, sel) / gz                            # (W, s, G)
    inv_x = jax.lax.rsqrt(dot3(xf * xf, sel) / gz - mu * mu + eps_ln)
    yhx = (xf - dot3(mu, selt)) * dot3(inv_x, selt)    # (W, s, C)
    lts = lts_ref[...].astype(f32)
    xn = (yhx * lts + ltb_ref[...].astype(f32)).astype(dt)

    # ---- fc1 + dwconv + skip + LN + gelu over the full window ----
    h = dot3(xn, w1_ref[...]) + b1_ref[...].astype(f32)
    h = h.astype(dt).astype(f32)                       # Dense rounding
    hp_ref[...] = jnp.pad(h, ((1, 1), (1, 1), (0, 0)))
    dwk = dw_ref[...].astype(f32)                      # (3, 3, hidden)
    acc = jnp.zeros((W, s, hidden), f32)
    q = hp_ref[...]
    for dj in range(3):
        csh = jax.lax.slice_in_dim(q, dj, dj + s, axis=1)
        for di in range(3):
            sl = jax.lax.slice_in_dim(csh, di, di + W, axis=0)
            acc = acc + sl * dwk[di, dj][None, None, :]
    d = (acc + dwb_ref[...].astype(f32)).astype(dt).astype(f32)
    y = d + h                                          # (W, s, hidden)
    muy = jnp.mean(y, axis=-1, keepdims=True)
    invy = jax.lax.rsqrt(
        jnp.mean(y * y, axis=-1, keepdims=True) - muy * muy + eps)
    yh = (y - muy) * invy
    ls = ls_ref[...].astype(f32)
    zf = (yh * ls + lb_ref[...].astype(f32)).astype(dt).astype(f32)
    erf_z = _erf(zf * (2.0 ** -0.5))
    half1e = 0.5 * (1.0 + erf_z)
    a = (zf * half1e).astype(dt)                       # gelu out, rounded
    gp = half1e + zf * jnp.exp(-0.5 * zf * zf) * _GELU_C

    # ---- backward through fc2 / gelu / LN ----
    da = jax.lax.dot_general(                          # g · w2ᵀ, no
        gw, w2_ref[...],                               # in-VMEM transpose
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)                    # (W, s, hidden)
    dz = da * gp
    dyh = dz * ls
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * yh, axis=-1, keepdims=True)
    dy = invy * (dyh - m1 - yh * m2)                   # = dd (cot. of d)
    dp_ref[...] = jnp.pad(dy, ((1, 1), (1, 1), (0, 0)))

    # ---- conv input grad for the CENTER rows (transpose = correlation
    # with the un-flipped kernel over the 1-padded dd) + the skip path ----
    dhc = jnp.zeros((rows, s, hidden), f32)
    for di in range(3):
        rw = dp_ref[pl.ds(off + 2 - di, rows)]         # (rows, s+2, h)
        for dj in range(3):
            sl = jax.lax.slice_in_dim(rw, 2 - dj, 2 - dj + s, axis=1)
            dhc = dhc + sl * dwk[di, dj][None, None, :]
    dy_c = jax.lax.slice_in_dim(
        dp_ref[pl.ds(off + 1, rows)], 1, 1 + s, axis=1)
    dh = dy_c + dhc                                    # (rows, s, hidden)

    # ---- fc1 input grad -> groupLN backward -> dx tile ----
    dxn = jax.lax.dot_general(                         # (rows, s, C)
        dh, w1_ref[...].astype(f32),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32)
    xcf = x_ref[0, pl.ds(r0, rows)].astype(f32)        # center re-read
    mu_c = dot3(xcf, sel) / gz
    inv_c = jax.lax.rsqrt(dot3(xcf * xcf, sel) / gz - mu_c * mu_c + eps_ln)
    inv_cb = dot3(inv_c, selt)
    yhx_c = (xcf - dot3(mu_c, selt)) * inv_cb
    dyhx = dxn * lts
    n1 = dot3(dot3(dyhx, sel) / gz, selt)
    n2 = dot3(dot3(dyhx * yhx_c, sel) / gz, selt)
    dx_ln = inv_cb * (dyhx - n1 - yhx_c * n2)
    gc = g_ref[0, pl.ds(r0, rows)].astype(f32)
    dx_ref[0] = (dx_ln + gc).astype(dt)                # + residual path

    # ---- weight grads: center-masked window reductions, fp32 VMEM
    # accumulation across the sequential (B, n_tiles) grid ----
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0)
    mc = ((wi >= off) & (wi < off + rows)).astype(f32)
    gm = gf * mc
    a2 = (a.astype(f32) * mc).reshape(W * s, hidden)
    g2 = gm.reshape(W * s, C)
    v_dw2 = jax.lax.dot_general(
        a2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)                    # (hidden, C)
    v_db2 = jnp.sum(gm, axis=(0, 1)).reshape(1, C)
    v_dls = jnp.sum(dz * yh * mc, axis=(0, 1)).reshape(1, hidden)
    v_dlb = jnp.sum(dz * mc, axis=(0, 1)).reshape(1, hidden)
    v_ddwb = jnp.sum(dy * mc, axis=(0, 1)).reshape(1, hidden)
    xn_c = (yhx_c * lts + ltb_ref[...].astype(f32)).astype(dt)
    v_dw1 = jax.lax.dot_general(
        xn_c.astype(f32).reshape(rows * s, C),
        dh.reshape(rows * s, hidden),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)                    # (C, hidden)
    v_db1 = jnp.sum(dh, axis=(0, 1)).reshape(1, hidden)
    v_dlts = jnp.sum(dxn * yhx_c, axis=(0, 1)).reshape(1, C)
    v_dltb = jnp.sum(dxn, axis=(0, 1)).reshape(1, C)

    first = (pl.program_id(0) == 0) & (j == 0)

    @pl.when(first)
    def _init():
        dw2_ref[...] = v_dw2
        db2_ref[...] = v_db2
        dls_ref[...] = v_dls
        dlb_ref[...] = v_dlb
        ddwb_ref[...] = v_ddwb
        dw1_ref[...] = v_dw1
        db1_ref[...] = v_db1
        dlts_ref[...] = v_dlts
        dltb_ref[...] = v_dltb

    @pl.when(jnp.logical_not(first))
    def _accum():
        dw2_ref[...] += v_dw2
        db2_ref[...] += v_db2
        dls_ref[...] += v_dls
        dlb_ref[...] += v_dlb
        ddwb_ref[...] += v_ddwb
        dw1_ref[...] += v_dw1
        db1_ref[...] += v_db1
        dlts_ref[...] += v_dlts
        dltb_ref[...] += v_dltb

    # ddw taps: dd(center) x the matching h window (hp_ref[p] = h(p-1)).
    for di in range(3):
        hw = hp_ref[pl.ds(off + di, rows)]             # (rows, s+2, h)
        for dj in range(3):
            sl = jax.lax.slice_in_dim(hw, dj, dj + s, axis=1)
            tap = jnp.sum(dy_c * sl, axis=(0, 1))

            @pl.when(first)
            def _i(di=di, dj=dj, tap=tap):
                ddw_ref[di, dj] = tap

            @pl.when(jnp.logical_not(first))
            def _a(di=di, dj=dj, tap=tap):
                ddw_ref[di, dj] += tap


@functools.partial(
    jax.jit, static_argnames=("s", "hidden", "groups", "eps_ln", "eps",
                              "interpret"))
def fused_mixffn_ln_skip_bwd(x, lts, ltb, w1, b1, dw, dwb, ln_scale,
                             ln_bias, w2, b2, g, *, s: int, hidden: int,
                             groups: int, eps_ln: float = 1e-5,
                             eps: float = 1e-5, interpret: bool = False):
    """Backward of fused_mixffn_ln_skip given cotangent g of the output.

    Returns grads in primal order (x, lts, ltb, w1, b1, dw, dwb,
    ln_scale, ln_bias, w2, b2); weight grads fp32, dx in x.dtype. b2's
    value is never needed (its grad is the column-sum of g)."""
    B, N, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    rows = _pick_rows_bwd(s, C, hidden, itemsize)
    if rows == 0 or C % groups:
        raise NotImplementedError("no backward row tiling fits")
    f32 = jnp.float32
    gsz = C // groups
    gid = jnp.arange(C, dtype=jnp.int32) // gsz
    sel = (gid[:, None] == jnp.arange(groups)[None, :]).astype(f32)
    W = rows + (0 if rows == s else 4)

    grid = (B, s // rows)
    const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_ln, s=s, rows=rows, hidden=hidden,
                          groups=groups, eps_ln=eps_ln, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, s, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s, C), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const2((C, groups)), const2((groups, C)),
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((3, 3, hidden)), const2((1, hidden)),
            const2((1, hidden)), const2((1, hidden)),
            const2((hidden, C)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, s, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((3, 3, hidden)), const2((1, hidden)),
            const2((1, hidden)), const2((1, hidden)),
            const2((hidden, C)), const2((1, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, s, s, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((3, 3, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W + 2, s + 2, hidden), f32),
            pltpu.VMEM((W + 2, s + 2, hidden), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * hidden * 6 + B * N * hidden * 9 * 4,
            bytes_accessed=3 * B * N * C * itemsize,
            transcendentals=2 * B * N * hidden,
        ),
        interpret=interpret,
    )(x.reshape(B, s, s, C), g.reshape(B, s, s, C), sel, sel.T,
      # Biases / LN params stay fp32 (the forward adds them in fp32);
      # only the matmul/conv weights round to the compute dtype.
      lts.reshape(1, C), ltb.reshape(1, C),
      w1.astype(x.dtype), b1.reshape(1, hidden),
      dw.reshape(3, 3, hidden).astype(x.dtype),
      dwb.reshape(1, hidden), ln_scale.reshape(1, hidden),
      ln_bias.reshape(1, hidden), w2.astype(x.dtype))
    (dx, dlts, dltb, dw1, db1, ddw, ddwb, dls, dlb, dw2, db2) = outs
    shp = lambda a, p: a.reshape(p.shape).astype(p.dtype)  # noqa: E731
    return (dx.reshape(B, N, C), shp(dlts, lts), shp(dltb, ltb),
            shp(dw1, w1), shp(db1, b1), shp(ddw, dw), shp(ddwb, dwb),
            shp(dls, ln_scale), shp(dlb, ln_bias), shp(dw2, w2),
            shp(db2, b2))
