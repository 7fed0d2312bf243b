"""Decoder cascade (MyDecoderLayer, networks/MSTr.py:230-290).

Each stage concatenates the skip map (channel-wise), projects, runs two
EfficientTransformerBlocks, then 2x patch-expands; the last stage uses the
4x expander plus a 1x1 conv segmentation head. NHWC throughout; the head
output is (B, H, W, num_classes) logits.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.ops.attention import EfficientTransformerBlock
from transception_tpu.ops.common import (
    FinalPatchExpandX4,
    PatchExpand,
    fwd_only_barrier,
    xavier,
)

Dtype = Any


class _ExpandParams(nn.Module):
    """Param holder mirroring FinalPatchExpandX4's tree (layer_up/expand +
    layer_up/norm/ln) for head paths that apply the expansion manually."""

    in_c: int
    feats: int
    c: int

    @nn.compact
    def __call__(self):
        from transception_tpu.ops.common import _DenseKernelParam, _LNParams
        w = _DenseKernelParam((self.in_c, self.feats), name="expand")()
        s, b = _LNParams(self.c, name="norm")()
        return w, s, b


class _HeadParams(nn.Module):
    """Param holder mirroring the 1x1 head conv tree (last_layer)."""

    c: int
    n: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", xavier, (1, 1, self.c, self.n),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.n,),
                       jnp.float32)
        return k, b


class DecoderLayer(nn.Module):
    """One decoder stage (MSTr.py:230-290)."""

    in_dim: int      # in_out_chan[0] ('dims' in the reference)
    out_dim: int     # in_out_chan[1]
    token_mlp: str = "mix_skip"
    n_class: int = 9
    is_last: bool = False
    use_pallas: bool = False
    # None -> follow use_pallas; forwarded to the blocks' whole-attention
    # fold (see ops/attention.py EfficientTransformerBlock.attn_fold).
    attn_fold: object = None
    # None -> follow use_pallas; forwarded to the blocks' fused-FFN
    # sub-block (EfficientTransformerBlock.ffn_fold).
    ffn_fold: object = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2: Optional[jnp.ndarray] = None,
                 argmax_head: bool = False, wide_head: bool = False):
        """x1: (B, N, C) tokens from below; x2: (B, H, W, C) skip map.

        argmax_head (last stage, inference only): run the 1x1 head conv
        and the class argmax in PRE-pixel-shuffle token order and shuffle
        the uint8 class map instead of the (B, N, 16·dim) activation —
        both the conv (per-pixel) and the argmax (per-pixel) commute with
        the shuffle permutation exactly, and the two measured-expensive
        bf16 layout copies (2.59 + 2.49 ms at b=128) collapse to a uint8
        copy. Returns (B, 4H, 4W) uint8 class ids instead of logits.

        wide_head (last stage, training): return (B, N, p², n_class) fp32
        logits in PRE-pixel-shuffle token order — the loss permutes the
        (no-grad) labels instead of the activations. The expansion dot
        emits (B, N, p², c) directly, so neither the pixel shuffle's
        transpose nor the (B, N, p²c) <-> (B, p²N, c) re-tiling reshapes
        around the LN exist in the graph; their backward was measured at
        ~14 ms of the 104 ms bs-24 train step (twelve 308 MB fp32
        broadcast/reshape/copy ops in the r4 profile). Same params and
        per-pixel math as the standard head (the shuffle is a pure token
        permutation; LN and the 1x1 conv are per-token)."""
        if x2 is None:
            # Bottom stage: expand only (MSTr.py:284-289).
            B = x1.shape[0]
            n = x1.shape[1]
            side = int(round(n ** 0.5))
            return PatchExpand(self.out_dim, use_pallas=self.use_pallas,
                               dtype=self.dtype,
                               name="layer_up")(x1, side, side)

        B, H, W, C = x2.shape
        skip = x2.reshape(B, H * W, C)
        cat = jnp.concatenate([x1, skip], axis=-1)
        t = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier, name="concat_linear")(cat)
        t = EfficientTransformerBlock(
            self.out_dim, self.out_dim, self.out_dim,
            token_mlp=self.token_mlp, use_pallas=self.use_pallas,
            attn_fold=self.attn_fold, ffn_fold=self.ffn_fold,
            dtype=self.dtype, name="layer_former_1")(t, H, W)
        t = EfficientTransformerBlock(
            self.out_dim, self.out_dim, self.out_dim,
            token_mlp=self.token_mlp, use_pallas=self.use_pallas,
            attn_fold=self.attn_fold, ffn_fold=self.ffn_fold,
            dtype=self.dtype, name="layer_former_2")(t, H, W)
        if self.is_last:
            p = 4
            if wide_head:
                import jax

                C_in = t.shape[-1]
                c = self.out_dim
                w, ls, lb = _ExpandParams(C_in, 16 * c, c,
                                          name="layer_up")()
                # Same contraction as the Dense expand (fp32 accumulation,
                # rounded to the compute dtype) but born c-minor.
                y = jnp.einsum(
                    "bnk,kqc->bnqc", t,
                    w.astype(self.dtype).reshape(C_in, p * p, c),
                    preferred_element_type=jnp.float32).astype(self.dtype)
                # Keep the 16x stream in the compute dtype (same role as
                # the barrier in _expand_epilogue).
                y = fwd_only_barrier(y)
                # LN over c — flax fast-variance formula
                # (ops/common.py LayerNorm), fp32 stats.
                yf = y.astype(jnp.float32)
                mean = jnp.mean(yf, axis=-1, keepdims=True)
                var = jnp.mean(yf * yf, axis=-1, keepdims=True) \
                    - mean * mean
                xn = (yf - mean) * (jax.lax.rsqrt(var + 1e-5)
                                    * ls.astype(jnp.float32)) \
                    + lb.astype(jnp.float32)
                xn = xn.astype(self.dtype)
                # fp32 head per c-vector ((N, p²) act as spatial dims).
                return nn.Conv(self.n_class, (1, 1), dtype=jnp.float32,
                               param_dtype=jnp.float32, kernel_init=xavier,
                               name="last_layer")(xn)
            if argmax_head:
                from transception_tpu.ops.pallas.patch_expand import (
                    can_fuse,
                    fused_expand_argmax,
                )
                C_in = t.shape[-1]
                # bf16 models only: the in-kernel fp32 head dot has a
                # different accumulation order than XLA's conv, so exact
                # fp32-resolution argmax ties may differ — the fp32
                # protocol eval path keeps the bit-exact conv+argmax
                # composition below.
                if self.use_pallas and self.dtype == jnp.bfloat16 and \
                        can_fuse(t.shape, H, W, C_in,
                                 self.out_dim, p, t.dtype):
                    # Whole epilogue in ONE kernel: expand + grouped LN +
                    # fp32 head + argmax. HBM sees only p² ints/token —
                    # no (B, N, p²c) layout copy, no logits tensor.
                    w, ls, lb = _ExpandParams(
                        C_in, 16 * self.out_dim, self.out_dim,
                        name="layer_up")()
                    hw, hb = _HeadParams(self.out_dim, self.n_class,
                                         name="last_layer")()
                    ids = fused_expand_argmax(
                        t.astype(self.dtype), w, ls, lb,
                        hw.reshape(self.out_dim, self.n_class), hb,
                        H=H, W=W, p=p, c=self.out_dim,
                        n_class=self.n_class)
                    cls = ids.astype(jnp.uint8).reshape(
                        B, H, W, p, p).transpose(0, 1, 3, 2, 4)
                    return cls.reshape(B, p * H, p * W)
                # (B, N, p², c) pre-shuffle; the 1x1 conv applies per
                # c-vector so the (N, p²) axes act as spatial dims —
                # identical params to the post-shuffle conv below. XLA
                # fuses the conv with the argmax (one iota_reduce fusion,
                # measured 1.14 ms); expressing this as a flattened 2-D
                # dot instead was measured WORSE (+2.4 ms): the
                # (..., 64)-minor re-tiling reshape costs more than the
                # conv's layout copy.
                t = FinalPatchExpandX4(self.out_dim,
                                       use_pallas=self.use_pallas,
                                       dtype=self.dtype, name="layer_up")(
                    t, H, W, pre_shuffle=True)
                logits = nn.Conv(self.n_class, (1, 1), dtype=jnp.float32,
                                 param_dtype=jnp.float32, kernel_init=xavier,
                                 name="last_layer")(t)
                cls = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                cls = cls.reshape(B, H, W, p, p).transpose(0, 1, 3, 2, 4)
                return cls.reshape(B, p * H, p * W)
            t = FinalPatchExpandX4(self.out_dim, use_pallas=self.use_pallas,
                                   dtype=self.dtype,
                                   name="layer_up")(t, H, W)
            m = t.reshape(B, 4 * H, 4 * W, self.out_dim)
            # fp32 head (logits policy); flax promotes the bf16 input
            # inside the conv, so XLA fuses the cast instead of
            # materializing a 224²·fp32 copy first.
            return nn.Conv(self.n_class, (1, 1), dtype=jnp.float32,
                           param_dtype=jnp.float32, kernel_init=xavier,
                           name="last_layer")(m)
        return PatchExpand(self.out_dim, use_pallas=self.use_pallas,
                           dtype=self.dtype, name="layer_up")(t, H, W)
