"""Pallas TPU kernel: fused softmax cross-attention for the bridge.

The bridge's spatial attention (M_EfficientSelfAtten, MSTr.py:2254-2292)
attends the full 6076-token fused sequence against a Scale_reduce'd KV of
only 784 tokens. XLA's lowering materializes the (B, N, M) fp32 attention
matrix in HBM — at the published shapes that is 128·6076·784·4 B ≈ 2.4 GB
written + read per layer, ~21 ms/batch of pure bandwidth on v5e (measured:
the single largest cost in the forward pass). This kernel computes
logits -> row softmax -> ·V per N-tile entirely in VMEM: K and V
(784·64·bf16 ≈ 100 KB each) are resident, the attention matrix never
touches HBM.

Accumulation fp32 on the MXU, softmax fp32 on the VPU; the probability
matrix is cast to the value dtype before the second matmul, matching the
XLA path's `.astype(v.dtype)` bit pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_TILE_N = 512


def eligible(q_shape, k_shape, dtype) -> bool:
    """Static gate: KV and one N-tile of logits must fit VMEM."""
    B, h, N, d = q_shape
    M = k_shape[2]
    itemsize = jnp.dtype(dtype).itemsize
    tile = min(_TILE_N, N)
    need = (tile * d + 2 * M * d) * itemsize + tile * M * 4 + tile * d * 4
    return need <= _VMEM_BUDGET_BYTES and M >= 8 and d >= 8


def eligible_folded(x_shape, k_shape, heads: int, dtype) -> bool:
    """Gate for the q/proj/residual-folded variant (adds the (tile, C)
    fp32 accumulator and the two C-wide stream tiles)."""
    B, N, C = x_shape
    if heads < 1 or C % heads:
        return False
    d = C // heads
    M = k_shape[2]
    itemsize = jnp.dtype(dtype).itemsize
    tile = min(_TILE_N, N)
    # K/V resident with ALL heads (heads*M*d = M*C each, fetched once per
    # batch row), plus the two C-wide stream tiles, the fp32 logits tile
    # and the fp32 proj accumulator.
    need = ((2 * tile * C + 2 * M * C) * itemsize + tile * M * 4
            + tile * C * 4 + tile * d * 4)
    return need <= _VMEM_BUDGET_BYTES and M >= 8 and d >= 8


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    # Normalize on the (tile, d) OUTPUT instead of dividing the (tile, M)
    # probability matrix — one fewer full VPU pass over the logits tile
    # (d << M). Differs from dividing-then-rounding by <= 1 output ULP.
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = out.astype(o_ref.dtype)


def _folded_kernel(x_ref, r_ref, wq_ref, bq_ref, k_ref, v_ref, wp_ref,
                   bp_ref, o_ref, acc_ref, *, scale: float, heads: int):
    """q-projection, per-head attention, output projection and the layer
    residual in one kernel. Grid (B, n_tiles, heads) with heads INNERMOST:
    the (b, j) output block is revisited across h, accumulating each
    head's proj contribution in the fp32 scratch — numerically identical
    to XLA's single (C, C) proj matmul over the concatenated heads (fp32
    accumulation, same per-head rounding points: q-Dense rounds to the
    compute dtype, attention out rounds before proj).

    Removes from XLA: the q Dense (+its (B,N,h,d) head transpose), the
    output head-merge transpose, the proj Dense, and the residual add —
    each a full pass over the ~100 MB token stream at the published
    shapes (MSTr.py:2254-2292; ops path models/bridge.py
    MEfficientSelfAtten)."""
    h = pl.program_id(2)
    dt = o_ref.dtype
    f32 = jnp.float32
    x = x_ref[0]                                    # (tile, C) dt
    q = jax.lax.dot_general(
        x, wq_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bq_ref[0].astype(f32)
    q = q.astype(dt)                                # Dense rounding
    # K/V blocks hold ALL heads for the batch row (index constant in j
    # and h -> fetched once per b, not per grid step); the head slice is
    # a dynamic index on an untiled leading dim.
    k = k_ref[0, h]                                 # (M, d)
    v = v_ref[0, h]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * scale
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    # Normalize on the (tile, d) output, not the (tile, M) matrix (see
    # _kernel) — saves a full VPU pass over the logits tile per step.
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    out = (out / jnp.sum(e, axis=1, keepdims=True)).astype(dt)
    part = jax.lax.dot_general(
        out, wp_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                 # (tile, C) fp32

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(h > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(h == heads - 1)
    def _emit():
        proj = (acc_ref[...] + bp_ref[...].astype(f32)).astype(dt)
        o_ref[0] = (proj.astype(f32)
                    + r_ref[0].astype(f32)).astype(dt)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    """Flash-style backward tile: recompute logits/softmax for this
    N-tile in VMEM (never materializing the (N, M) matrix in HBM), write
    dQ for the tile, accumulate dK/dV across the N-tile grid dimension
    (the kernel revisits the same (bh,) dK/dV block for every j; grid
    iterates j innermost, so += accumulation is well-defined)."""
    j = pl.program_id(1)
    f32 = jnp.float32
    q = q_ref[0].astype(f32)          # (tile, d)
    k = k_ref[0].astype(f32)          # (M, d)
    v = v_ref[0].astype(f32)
    g = g_ref[0].astype(f32)          # (tile, d)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * scale
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    # Exact gradients with 1/rowsum factored onto the (tile, d)/(tile, 1)
    # side of every product, so no division pass ever runs over the
    # (tile, M) matrix: with P = E/s (s = rowsum(E)),
    #   dV = Pᵀg = Eᵀ(g/s);  dL = P∘(dP − rowsum(P∘dP)) = T/s,
    #   T = E∘(dP − rowsum(E∘dP)/s);  dQ = (T·K)·scale/s;
    #   dK = Tᵀ(q/s)·scale.
    s = jnp.sum(e, axis=1, keepdims=True)              # (tile, 1)
    gs = g / s                                         # (tile, d)
    dv = jax.lax.dot_general(
        e, gs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)                    # (M, d)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                    # (tile, M)
    c = jnp.sum(e * dp, axis=1, keepdims=True) / s     # rowsum(P∘dP)
    t = e * (dp - c)                                   # (tile, M)
    dq = jax.lax.dot_general(
        t, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) * (scale / s)      # (tile, d)
    dk = jax.lax.dot_general(
        t, q / s, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32) * scale            # (M, d)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] += dk.astype(dk_ref.dtype)
        dv_ref[0] += dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def bridge_softmax_attention_bwd(q, k, v, g, scale: float,
                                 interpret: bool = False):
    """Backward of softmax(q·kᵀ·scale)·v w.r.t. (q, k, v) given cotangent
    g of the output — tiled like the forward; the (N, M) probability
    matrix is recomputed per tile in VMEM and never touches HBM (the XLA
    backward materializes it twice: dSoftmax and dV paths).

    dK/dV accumulate in fp32 and are returned in fp32 (cast at the
    caller); zero rows added by N-padding contribute zero because the
    padded g rows are zero."""
    B, h, N, d = q.shape
    M = k.shape[2]
    bh = B * h
    tile = min(_TILE_N, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    qr = q.reshape(bh, N, d)
    gr = g.reshape(bh, N, d)
    if pad:
        qr = jnp.pad(qr, ((0, 0), (0, pad), (0, 0)))
        gr = jnp.pad(gr, ((0, 0), (0, pad), (0, 0)))
    kr = k.reshape(bh, M, d)
    vr = v.reshape(bh, M, d)
    f32 = jnp.float32

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_tiles * tile, d), q.dtype),
            jax.ShapeDtypeStruct((bh, M, d), f32),
            jax.ShapeDtypeStruct((bh, M, d), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n_tiles * tile * M * d * 5,
            bytes_accessed=bh * (2 * N * d * 2 + 4 * M * d * 4),
            transcendentals=bh * N * M,
        ),
        interpret=interpret,
    )(qr, kr, vr, gr)
    if pad:
        dq = dq[:, :N]
    return (dq.reshape(B, h, N, d),
            dk.reshape(B, h, M, d).astype(k.dtype),
            dv.reshape(B, h, M, d).astype(v.dtype))


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def bridge_softmax_attention(q, k, v, scale: float,
                             interpret: bool = False):
    """q: (B, h, N, d); k, v: (B, h, M, d) -> (B, h, N, d).

    out = softmax(q·kᵀ·scale, axis=M) · v, fused per (batch·head, N-tile).
    Raises NotImplementedError for shapes outside the VMEM gate — callers
    fall back to the XLA einsum pair."""
    B, h, N, d = q.shape
    M = k.shape[2]
    if not eligible(q.shape, k.shape, q.dtype):
        raise NotImplementedError("shape ineligible for the fused kernel")

    bh = B * h
    tile = min(_TILE_N, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    qr = q.reshape(bh, N, d)
    if pad:
        # Zero rows -> uniform softmax over V: finite, sliced away below.
        qr = jnp.pad(qr, ((0, 0), (0, pad), (0, 0)))
    kr = k.reshape(bh, M, d)
    vr = v.reshape(bh, M, d)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_tiles * tile, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * N * M * (d + d),
            bytes_accessed=(N * d * 2 + 2 * M * d) * bh
            * jnp.dtype(q.dtype).itemsize,
            transcendentals=bh * N * M,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    if pad:
        out = out[:, :N]
    return out.reshape(B, h, N, d)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def bridge_attention_folded(x, res, wq, bq, k, v, wp, bp, scale: float,
                            interpret: bool = False):
    """Folded bridge spatial attention: x is the post-norm1 (B, N, C)
    token stream, res the raw layer input; k/v: (B, heads, M, d) from the
    Scale_reduce'd KV Dense. Returns res + proj(MHA(x)) — see
    _folded_kernel. Weights are re-laid out with the head axis leading
    ((heads, C, d) / (heads, d, C)) so every block keeps full, aligned
    trailing dims (Mosaic rejects lane-dim sub-blocking)."""
    B, N, C = x.shape
    _, heads, M, d = k.shape
    if not eligible_folded(x.shape, k.shape, heads, x.dtype):
        raise NotImplementedError("shape ineligible for the folded kernel")
    tile = min(_TILE_N, N)
    n_tiles = -(-N // tile)
    pad = n_tiles * tile - N
    if pad:
        # Tail rows produce finite garbage (uniform-softmax attn + res);
        # sliced away below — same invariant as the unfolded kernel.
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        res = jnp.pad(res, ((0, 0), (0, pad), (0, 0)))
    dt = x.dtype
    wq_r = wq.astype(dt).reshape(C, heads, d).transpose(1, 0, 2)
    bq_r = bq.reshape(heads, d)
    wp_r = wp.astype(dt).reshape(heads, d, C)

    out = pl.pallas_call(
        functools.partial(_folded_kernel, scale=scale, heads=heads),
        grid=(B, n_tiles, heads),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, j, h: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, j, h: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, d), lambda b, j, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b, j, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, M, d), lambda b, j, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, M, d), lambda b, j, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, C), lambda b, j, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            # (1, C) not (C,): Mosaic's 1-D fp32 tiling rejects non-tile-
            # aligned lengths (observed at feats=640 in expand_kernel);
            # every affine operand ships 2-D for uniformity.
            pl.BlockSpec((1, C), lambda b, j, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, j, h: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, C), dt),
        scratch_shapes=[pltpu.VMEM((tile, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * N * M * 2 * d
            + 2 * B * N * C * C * 2,
            bytes_accessed=B * N * C * 3 * jnp.dtype(dt).itemsize,
            transcendentals=B * heads * N * M,
        ),
        interpret=interpret,
    )(x, res, wq_r, bq_r, k.astype(dt), v.astype(dt), wp_r,
      bp.reshape(1, C))
    if pad:
        out = out[:, :N]
    return out
