"""BatchNorm conv blocks (MSViT building blocks).

Behavioral reference: networks/MSTr.py:309-404 (Conv2d_BN / DWConv2d_BN),
:670-732 (DWCPatchEmbed / Patch_Embed_stage), :996-1050 (ResBlock).

BatchNorm notes: torch momentum 0.1 == flax momentum 0.9; under a single
jit over the global sharded batch, batch stats are computed over the global
batch (GSPMD inserts the cross-chip mean), which is strictly better than the
reference's unsynced DataParallel stats.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.ops.common import DepthwiseConv, xavier

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm with torch-equivalent momentum/eps. Stats and params are
    always stored fp32; TRAIN also computes in fp32 (batch-stat
    accumulation precision). EVAL computes the running-stat affine in the
    compute dtype: with dtype=fp32 that is the bit-identical old path
    (the parity/protocol configs), while bf16 eval keeps the conv -> BN
    chain in bf16 — the old always-fp32 eval forced XLA to materialize an
    fp32 copy (with a layout change) of every BN input, measured 1.35 ms
    for ONE stage-3 (128, 14, 14, 128) depthwise conv in the r5 b=128
    trace. Numerics shift is ~1 bf16 ulp on an output that was rounded to
    bf16 anyway (golden regression regenerated deliberately in r5)."""

    dtype: Dtype = jnp.bfloat16
    scale_init: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train or self.dtype == jnp.float32:
            # flax BatchNorm ignores `dtype` for fp32 params (computes in
            # fp32 regardless) — exactly what train and the fp32 parity
            # configs want.
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             scale_init=nn.initializers.constant(
                                 self.scale_init),
                             name="bn")(x)
            return y.astype(self.dtype)
        return _EvalBNAffine(dtype=self.dtype, scale_init=self.scale_init,
                             name="bn")(x)


class _EvalBNAffine(nn.Module):
    """Running-stat BN affine in the compute dtype, on the variable tree
    nn.BatchNorm creates (params bn/{scale,bias}, batch_stats
    bn/{mean,var}, all fp32). The rsqrt coefficient is computed fp32 and
    rounded once; everything per-pixel stays bf16 so XLA keeps the
    surrounding conv chain bf16 (see BatchNorm docstring)."""

    dtype: Dtype = jnp.bfloat16
    scale_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale",
                           nn.initializers.constant(self.scale_init),
                           (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((C,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((C,), jnp.float32))
        a = (jax.lax.rsqrt(var.value + 1e-5) * scale).astype(self.dtype)
        return ((x.astype(self.dtype) - mean.value.astype(self.dtype)) * a
                + bias.astype(self.dtype))


def hardswish(x):
    return jax.nn.hard_swish(x)


class Conv2dBN(nn.Module):
    """conv(no bias) -> BN -> optional act (MSTr.py:364-404)."""

    out_ch: int
    kernel_size: int = 1
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    groups: int = 1
    bn_weight_init: float = 1.0
    act: Optional[str] = None  # None | 'hardswish'
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, p = self.kernel_size, self.pad
        y = nn.Conv(self.out_ch, (k, k), strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="conv")(x)
        y = BatchNorm(dtype=self.dtype, scale_init=self.bn_weight_init,
                      name="bn")(y, train)
        if self.act == "hardswish":
            y = hardswish(y)
        return y


class DWConv2dBN(nn.Module):
    """Depthwise-separable conv: dw kxk -> pw 1x1 -> BN -> Hardswish
    (MSTr.py:309-362). The reference only instantiates it with
    in_ch == out_ch (groups=out_ch), i.e. a true depthwise."""

    out_ch: int
    kernel_size: int = 1
    stride: int = 1
    act: bool = True
    bn_weight_init: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        p = (k - 1) // 2
        y = DepthwiseConv(self.out_ch, (k, k),
                          strides=(self.stride, self.stride),
                          padding=((p, p), (p, p)), use_bias=False,
                          dtype=self.dtype, name="dwconv")(x)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=xavier,
                    name="pwconv")(y)
        y = BatchNorm(dtype=self.dtype, scale_init=self.bn_weight_init,
                      name="bn")(y, train)
        if self.act:
            y = hardswish(y)
        return y


class DWCPatchEmbed(nn.Module):
    """Depthwise-conv patch embedding, 3x3 stride 1 or 2 (MSTr.py:670-702)."""

    embed_dim: int
    patch_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DWConv2dBN(self.embed_dim, kernel_size=self.patch_size,
                          stride=self.stride, dtype=self.dtype,
                          name="patch_conv")(x, train)


class PatchEmbedStage(nn.Module):
    """RIPM core: num_path depthwise patch embeds applied *sequentially*,
    the first strided 2 when is_pool; each intermediate result is emitted as
    one multi-scale branch input (MSTr.py:704-732)."""

    embed_dim: int
    num_path: int = 3
    is_pool: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for idx in range(self.num_path):
            stride = 2 if (self.is_pool and idx == 0) else 1
            x = DWCPatchEmbed(self.embed_dim, patch_size=3, stride=stride,
                              dtype=self.dtype,
                              name=f"patch_embeds_{idx}")(x, train)
            outs.append(x)
        return outs


class ResBlock(nn.Module):
    """Inverted-residual conv branch of each MHCA stage (MSTr.py:996-1050):
    Conv2d_BN(1x1, hswish) -> dw3x3 -> BN -> hswish -> Conv2d_BN(1x1) + id."""

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv2dBN(self.dim, act="hardswish", dtype=self.dtype,
                     name="conv1")(x, train)
        h = DepthwiseConv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, dtype=self.dtype,
                          name="dwconv")(h)
        h = BatchNorm(dtype=self.dtype, name="norm")(h, train)
        h = hardswish(h)
        h = Conv2dBN(self.dim, dtype=self.dtype, name="conv2")(h, train)
        return x + h
