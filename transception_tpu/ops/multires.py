"""MultiRes inception-conv token branches (EffSegformer.py:175-691).

Used by the reference's ResInception experiments (networks/comment.py —
dead code as shipped, but part of the component inventory). The family
MultiResBlock_{1,3,5,15,13,...} is one parametric module here: a conv chain
1x1-res -> 3x3 -> 5x5(=3x3 on 3x3) -> 7x7(=3x3 on 5x5), with a subset of
branch outputs maxpooled, token-flattened, concatenated, and LayerNormed.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.ops.common import LayerNorm, xavier
from transception_tpu.ops.conv import BatchNorm

Dtype = Any


class ConvBlock(nn.Module):
    """conv -> [act] -> BN orderings of the reference conv_block
    (EffSegformer.py:175-200): act None -> conv+BN; 'relu' -> conv+ReLU+BN;
    'sigmoid' -> conv+BN+sigmoid."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    act: str = "relu"  # 'relu' | 'sigmoid' | 'none'
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, p = self.kernel_size, self.padding
        y = nn.Conv(self.out_ch, (k, k), strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=xavier,
                    name="conv")(x)
        if self.act == "relu":
            y = jax.nn.relu(y)
            return BatchNorm(dtype=self.dtype, name="bn")(y, train)
        if self.act == "sigmoid":
            y = BatchNorm(dtype=self.dtype, name="bn")(y, train)
            return jax.nn.sigmoid(y)
        return BatchNorm(dtype=self.dtype, name="bn")(y, train)


class ResConvBlock(nn.Module):
    """1x1-res + 3x3-main, ReLU, BN (EffSegformer.py:204-222)."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = ConvBlock(self.out_ch, 1, 1, 0, act="none", dtype=self.dtype,
                        name="res")(x, train)
        main = ConvBlock(self.out_ch, dtype=self.dtype, name="main")(x, train)
        out = jax.nn.relu(res + main)
        return BatchNorm(dtype=self.dtype, name="bn")(out, train)


class MultiResBlock(nn.Module):
    """Parametric MultiResBlock (EffSegformer.py:407-691).

    branches selects which outputs are emitted as token streams:
    'res' (1x1), '3' (3x3), '5' (5x5 effective), '7' (7x7 effective).
    The reference variants map to: _1 -> ('res',), _3 -> ('3',),
    _5 -> ('5',), _13 -> ('res','3'), _15 -> ('res','5')."""

    U: int
    branches: Tuple[str, ...] = ("res", "3", "5")
    downsample: int = 2
    alpha: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        W = self.alpha * self.U
        need = set(self.branches)

        def pool_tokens(m):
            d = self.downsample
            B, H, W_, C = m.shape
            p = nn.max_pool(m, (d, d), strides=(d, d))
            return p.reshape(B, -1, C)

        outs = []
        res = ConvBlock(W, 1, 1, 0, act="none", dtype=self.dtype,
                        name="residual_layer")(x, train)
        if "res" in need:
            outs.append(pool_tokens(res))
        c3 = ConvBlock(W, dtype=self.dtype, name="conv3x3")(x, train)
        if "3" in need:
            outs.append(pool_tokens(c3))
        if need & {"5", "7"}:
            c5 = ConvBlock(W, dtype=self.dtype, name="conv5x5")(c3, train)
            if "5" in need:
                outs.append(pool_tokens(c5))
            if "7" in need:
                c7 = ConvBlock(W, dtype=self.dtype, name="conv7x7")(c5, train)
                outs.append(pool_tokens(c7))
        cat = jnp.concatenate(outs, axis=1)
        return LayerNorm(dtype=self.dtype, name="norm")(cat)
