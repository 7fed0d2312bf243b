"""Intra-stage Feature Fusion (IFF) zoo.

Fuses the num_path+1 branch outputs of an MHCA stage into the next stage's
input. Default for the published model is CoordAtt ('coord').

Behavioral reference: networks/MSTr.py —
  CoordAtt :1304-1348 (+ silu gates :1270-1286, minus the hardcoded .cuda()
  device bug at :1276 which this rebuild does not replicate),
  SE_Block :571-594, SK_Block :1054-1107, CBAM :1128-1267,
  CAM modules :464-568, Conv3d concat variants :406-462, :597-666.
All maps are NHWC; the 'path' axis of the 3D variants is kept explicit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.ops.common import gelu, xavier
from transception_tpu.ops.conv import BatchNorm

Dtype = Any


def silu_sigmoid(x):
    """min(silu(x+3)/6, 1) — the reference's h-sigmoid approximation
    (MSTr.py:1270-1277), device-portable."""
    return jnp.minimum(jax.nn.silu(x + 3.0) / 6.0, 1.0)


def silu_swish(x):
    """x * silu_sigmoid(x) (MSTr.py:1279-1286)."""
    return x * silu_sigmoid(x)


class CoordAtt(nn.Module):
    """Coordinate attention (default IFF, MSTr.py:1304-1348).

    Pool along H and W separately, shared 1x1+BN+silu_swish trunk, per-axis
    sigmoid gates, then a 1x1 out-projection to the next stage dim. The
    pool-h/pool-w concat is done on the length axis exactly as the
    reference's dim-2 concat of (B,C,H,1) and (B,C,W,1)."""

    oup: int
    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        mip = max(8, C // self.reduction)
        x_h = jnp.mean(x, axis=2)  # (B, H, C) — pooled over W
        x_w = jnp.mean(x, axis=1)  # (B, W, C) — pooled over H
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B,H+W,1,C)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = silu_swish(y)
        y_h, y_w = y[:, :H], y[:, H:]
        a_h = jax.nn.sigmoid(
            nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="conv_h")(y_h))  # (B,H,1,C)
        a_w = jax.nn.sigmoid(
            nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="conv_w")(y_w))  # (B,W,1,C)
        out = x * a_h[:, :, 0, :][:, :, None, :] * a_w[:, :, 0, :][:, None, :, :]
        return nn.Conv(self.oup, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=xavier,
                       name="conv_in_out")(out)


class SEBlock(nn.Module):
    """Squeeze-excitation + 1x1 out conv (MSTr.py:571-594):
    GAP -> fc/ReLU/fc/sigmoid scale -> conv1x1 -> ReLU(BN(.))."""

    out_ch: int
    r: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(C // self.r, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(C, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        x = x * s[:, None, None, :]
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return jax.nn.relu(BatchNorm(dtype=self.dtype, name="bn")(x, train))


class SKBlock(nn.Module):
    """Selective-kernel fusion over a list of paths (MSTr.py:1054-1107):
    sum -> GAP -> fc -> per-path fc -> softmax over paths -> weighted sum
    -> conv1x1 -> ReLU -> BN (the reference's Sequential order)."""

    in_ch: int
    out_ch: int
    num_path: int = 3
    reduction: int = 16
    L: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        d = max(self.L, self.in_ch // self.reduction)
        feats = jnp.stack(xs, axis=0)  # (P, B, H, W, C)
        u = jnp.sum(feats, axis=0)
        s = jnp.mean(u, axis=(1, 2))  # (B, C)
        z = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc")(s)
        ws = [nn.Dense(self.in_ch, dtype=self.dtype, param_dtype=jnp.float32,
                       name=f"fcs_{i}")(z) for i in range(len(xs))]
        w = jnp.stack(ws, axis=0)  # (P, B, C)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=0).astype(feats.dtype)
        v = jnp.sum(w[:, :, None, None, :] * feats, axis=0)
        v = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(v)
        v = jax.nn.relu(v)
        return BatchNorm(dtype=self.dtype, name="bn")(v, train)


class ChannelAttentionCBAM(nn.Module):
    """CBAM channel gate (MSTr.py:1128-1146)."""

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        mx = jnp.max(x, axis=(1, 2))
        av = jnp.mean(x, axis=(1, 2))
        # Shared MLP applied to both pooled vectors (reference shares se).
        se_fc1 = nn.Dense(C // self.reduction, use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="se_fc1")
        se_fc2 = nn.Dense(C, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="se_fc2")
        out = se_fc2(jax.nn.relu(se_fc1(mx))) + se_fc2(jax.nn.relu(se_fc1(av)))
        return jax.nn.sigmoid(out)[:, None, None, :]


class SpatialAttentionCBAM(nn.Module):
    """CBAM spatial gate (MSTr.py:1148-1165)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        av = jnp.mean(x, axis=-1, keepdims=True)
        y = jnp.concatenate([mx, av], axis=-1)
        p = self.kernel_size // 2
        y = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(y)
        return jax.nn.sigmoid(y)


class CBAMBlock(nn.Module):
    """CBAM IFF (MSTr.py:1169-1211): x*ca -> (*sa) -> +x -> conv/BN/ReLU."""

    out_ch: int
    use_sa: bool = True
    reduction: int = 16
    kernel_size: int = 7
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = x * ChannelAttentionCBAM(reduction=self.reduction,
                                       dtype=self.dtype, name="ca")(x)
        if self.use_sa:
            out = out * SpatialAttentionCBAM(kernel_size=self.kernel_size,
                                             dtype=self.dtype, name="sa")(out)
        out = out + x
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv")(out)
        out = BatchNorm(dtype=self.dtype, name="bn")(out, train)
        return jax.nn.relu(out)


class CBAMBlockCasa(nn.Module):
    """CBAM with 'res'/'out' spatial-gate interface for the casa backbone
    (MSTr.py:1213-1267). Takes the branch list; x[0] is the residual path."""

    out_ch: int
    use_sa: bool = True
    reduction: int = 16
    kernel_size: int = 7
    inter: str = "res"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        residual = xs[0]
        cat = jnp.concatenate(xs, axis=-1)
        out = cat * ChannelAttentionCBAM(reduction=self.reduction,
                                         dtype=self.dtype, name="ca")(cat)
        if self.use_sa and self.inter == "res":
            out = out * SpatialAttentionCBAM(kernel_size=self.kernel_size,
                                             dtype=self.dtype,
                                             name="sa")(residual)
        elif self.use_sa and self.inter == "out":
            out = out * SpatialAttentionCBAM(kernel_size=self.kernel_size,
                                             dtype=self.dtype, name="sa")(out)
        out = out + cat
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv")(out)
        out = BatchNorm(dtype=self.dtype, name="bn")(out, train)
        return jax.nn.relu(out)


class CAMModule(nn.Module):
    """Channel attention across paths (MSTr.py:464-509), max-energy trick.

    x: (B, P, H, W, C) with the path axis explicit; attention is (per B, C)
    a PxP matrix over flattened spatial."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, P, H, W, C = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        # (B, C, P, HW) to mirror the reference's B C P N layout.
        q = x.transpose(0, 4, 1, 2, 3).reshape(B, C, P, H * W)
        energy = jnp.einsum("bcpn,bcqn->bcpq", q, q,
                            preferred_element_type=jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcpq,bcqn->bcpn", attn, q,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, C, P, H, W).transpose(0, 2, 3, 4, 1)
        return gamma.astype(x.dtype) * out + x


class CAMFactorizedModule(nn.Module):
    """Factorized (linear) channel attention over the flattened path axis
    (MSTr.py:512-568). The reference computes but never uses its crpe member
    in forward (MSTr.py:552-557); this rebuild omits the dead member."""

    num_heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, P, H, W, C = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        # Tokens = (P*H*W) positions of dim C, matching x.reshape(B,C,-1).T.
        t = x.transpose(0, 4, 1, 2, 3).reshape(B, C, P * H * W)
        t = t.transpose(0, 2, 1)  # (B, N, C)
        N = t.shape[1]
        h = self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(t)
        qkv = qkv.reshape(B, N, 3, h, C // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        ks = jax.nn.softmax(k.astype(jnp.float32), axis=2).astype(k.dtype)
        ctx = jnp.einsum("bhnk,bhnv->bhkv", ks, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        att = jnp.einsum("bhnk,bhkv->bhnv", q, ctx,
                         preferred_element_type=jnp.float32)
        scale = (C // h) ** -0.5
        out = (scale * att).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        out = out.transpose(0, 2, 1).reshape(B, C, P, H, W)
        out = out.transpose(0, 2, 3, 4, 1)
        return gamma.astype(x.dtype) * out + x


class Conv3dBNConcat(nn.Module):
    """IFF variant '3d' (MSTr.py:406-462): stack paths on a depth axis,
    Conv3d(k=(P,1,1))+ReLU squeeze, then BN. The (P,1,1) conv is an einsum
    over the path axis."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.stack(xs, axis=1)  # (B, P, H, W, C)
        B, P, H, W, C = x.shape
        w = self.param("conv3d_kernel", xavier, (self.out_ch, C * P),
                       jnp.float32).reshape(self.out_ch, C, P)
        b = self.param("conv3d_bias", nn.initializers.zeros, (self.out_ch,),
                       jnp.float32)
        y = jnp.einsum("bphwc,ocp->bhwo", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = jax.nn.relu(y + b.astype(x.dtype))
        return BatchNorm(dtype=self.dtype, name="bn")(y, train)


class Conv3dBNChannelAttentionConcat(nn.Module):
    """IFF variants 'cam'/'cam_fact' (MSTr.py:597-666): BN3d -> CAM -> BN3d
    -> Conv3d(P,1,1)+GELU -> BN2d."""

    out_ch: int
    cam: str = "cam"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.stack(xs, axis=1)  # (B, P, H, W, C)
        B, P, H, W, C = x.shape
        # BN3d over (B, P, H, W) per channel == flax BatchNorm on last axis.
        bn3d = BatchNorm(dtype=self.dtype, name="bn3d")
        x = bn3d(x, train)
        if self.cam == "cam":
            x = CAMModule(dtype=self.dtype, name="channel_attention")(x)
        else:
            x = CAMFactorizedModule(dtype=self.dtype,
                                    name="channel_attention")(x)
        x = bn3d(x, train)
        w = self.param("conv3d_kernel", xavier, (self.out_ch, C * P),
                       jnp.float32).reshape(self.out_ch, C, P)
        b = self.param("conv3d_bias", nn.initializers.zeros, (self.out_ch,),
                       jnp.float32)
        y = jnp.einsum("bphwc,ocp->bhwo", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = gelu(y + b.astype(x.dtype))
        return BatchNorm(dtype=self.dtype, name="bn")(y, train)
