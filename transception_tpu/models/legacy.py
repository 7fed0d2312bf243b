"""Legacy / baseline model family.

* Transception (networks/Transception.py:1010-1057): the earlier two-branch
  inception encoder (MiT_3inception, :362-551) with joint fused-sequence
  linear attention; also the 3-branch (:553-723) and 4-stage (:728-889)
  variants.
* MISSFormer (networks/MISSFormer.py:357-405): the baseline U-former. Its
  encoder blocks lived in the repo's lost segformer.py (import-broken as
  shipped, MISSFormer.py:4); they are rebuilt here from the duplicated
  block definitions in EffSegformer.py / MSTr.py plus the published
  MISSFormer structure (SegFormer MiT encoder: heads (1,2,5,8), spatial-
  reduction ratios (8,4,2,1)).
* EffMISSFormer (networks/EfficientMISSFormer.py:302-340): MISSFormer with
  EfficientAttention blocks and no bridge.

All NHWC, same dtype policy as the flagship model.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.core.config import TransceptionConfig
from transception_tpu.models.bridge import BridgeGeometry, BridgeLayer4, split_scales
from transception_tpu.models.decoder import DecoderLayer
from transception_tpu.ops.attention import (
    EfficientTransformerBlock,
    efficient_linear_attention,
)
from transception_tpu.ops.common import (
    FinalPatchExpandX4,
    LayerNorm,
    OverlapPatchEmbed,
    PatchExpand,
    make_ffn,
    xavier,
)
from transception_tpu.ops.fusion import SKBlock

Dtype = Any


def _dense(f, name, dtype, use_bias=True):
    return nn.Dense(f, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=xavier, name=name)


def torch_nearest_resize(x: jnp.ndarray, out_h: int, out_w: int):
    """F.interpolate(mode='nearest') with torch's floor index convention
    (Transception.py:476,509,539). x: (B, H, W, C)."""
    B, H, W, C = x.shape
    rows = (jnp.arange(out_h) * H) // out_h
    cols = (jnp.arange(out_w) * W) // out_w
    return x[:, rows][:, :, cols]


class FuseEfficientAttention(nn.Module):
    """Linear attention over the fused multi-branch token sequence
    (Transception.py:18-87). NB the reference raw-reshapes (B, N, D) ->
    (B, D, N) (a view, not a transpose, Transception.py:51-53); replicated
    exactly since it defines the shipped computation."""

    key_channels: int
    value_channels: int
    head_count: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        k = _dense(self.key_channels, "keys", self.dtype)(x).reshape(
            B, self.key_channels, N)
        q = _dense(self.key_channels, "queries", self.dtype)(x).reshape(
            B, self.key_channels, N)
        v = _dense(self.value_channels, "values", self.dtype)(x).reshape(
            B, self.value_channels, N)
        h = self.head_count

        def to_heads(t, ch):
            return t.reshape(B, h, ch // h, N).transpose(0, 1, 3, 2)

        out = efficient_linear_attention(
            to_heads(q, self.key_channels), to_heads(k, self.key_channels),
            to_heads(v, self.value_channels))
        # (B, h, N, dv) -> (B, h*dv, N) -> permute(0,2,1) like the reference.
        out = out.transpose(0, 1, 3, 2).reshape(B, self.value_channels, N)
        out = out.transpose(0, 2, 1)
        return _dense(D, "reprojection", self.dtype)(out)


class EfficientTransformerBlockFuse(nn.Module):
    """Joint attention over 2-3 branch sequences, then per-branch split +
    per-branch MixFFN (Transception.py:188-251). The 3rd branch reuses mlp2
    and infers a square H3 (Transception.py:241-246)."""

    in_dim: int
    key_dim: int
    value_dim: int
    head_count: int = 1
    token_mlp: str = "mix_skip"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lens: Sequence[int], sizes: Sequence[Tuple[int, int]]):
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        a = FuseEfficientAttention(self.key_dim, self.value_dim,
                                   head_count=self.head_count,
                                   dtype=self.dtype, name="attn")(h)
        tx = x + a
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        mlp1 = make_ffn(self.token_mlp, self.in_dim, self.in_dim * 4,
                        self.dtype, "mlp1")
        mlp2 = make_ffn(self.token_mlp, self.in_dim, self.in_dim * 4,
                        self.dtype, "mlp2")
        mlps = [mlp1, mlp2, mlp2]  # 3rd branch reuses mlp2
        outs = []
        off = 0
        for i, (ln, (hh, ww)) in enumerate(zip(lens, sizes)):
            z = tx[:, off:off + ln, :]
            off += ln
            outs.append(z + mlps[i](norm2(z), hh, ww))
        return jnp.concatenate(outs, axis=1)


class EfficientTransformerBlockFuseRes(nn.Module):
    """Variant with one shared un-normed MLP over equal-length chunks
    (Transception.py:253-304)."""

    in_dim: int
    key_dim: int
    value_dim: int
    token_mlp: str = "mix_skip"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, chunk_len: int, H: int, W: int):
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        a = FuseEfficientAttention(self.key_dim, self.value_dim,
                                   head_count=1, dtype=self.dtype,
                                   name="attn")(h)
        tx = x + a
        mlp = make_ffn(self.token_mlp, self.in_dim, self.in_dim * 4,
                       self.dtype, "mlp")
        outs = []
        n = tx.shape[1] // chunk_len
        for i in range(n):
            z = tx[:, i * chunk_len:(i + 1) * chunk_len, :]
            outs.append(z + mlp(z, H, W))
        return jnp.concatenate(outs, axis=1)


class OverlapPatchEmbedFuse(nn.Module):
    """Patch embed with a dilation knob (EffSegformer.py:117-131)."""

    dim: int
    patch_size: int
    stride: int
    padding: int
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.padding
        y = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="proj")(x)
        B, H, W, C = y.shape
        t = LayerNorm(dtype=self.dtype, name="norm")(y.reshape(B, H * W, C))
        return t, H, W


# Inception kernel/padding schedules (Transception.py:371-394, 563-579).
def _two_branch_schedule(dil_conv: int):
    if dil_conv:
        return (dict(k=(7, 3, 3, 3), p=(3, 0, 0, 0)),
                dict(k=(1, 1, 1, 1), p=(0, 0, 0, 0)), 2)
    return (dict(k=(7, 3, 3, 3), p=(3, 1, 1, 1)),
            dict(k=(5, 1, 1, 1), p=(1, 0, 0, 0)), 1)


def _three_branch_schedule(dil_conv: int):
    if dil_conv:
        return (dict(k=(7, 5, 5, 5), p=(3, 0, 0, 0)),
                dict(k=(0, 3, 3, 3), p=(0, 0, 0, 0)),
                dict(k=(0, 1, 1, 1), p=(0, 0, 0, 0)), 2)
    return (dict(k=(7, 3, 3, 3), p=(3, 1, 1, 1)),
            dict(k=(5, 1, 1, 1), p=(1, 0, 0, 0)),
            dict(k=(0, 5, 5, 5), p=(0, 2, 2, 2)), 1)


class MiT3Inception(nn.Module):
    """Two-branch inception encoder (Transception.py:362-551): stage 1 is a
    plain efficient-transformer stage; stages 2-4 embed with two kernel
    sizes, run joint fuse blocks, split, nearest-resize branch 1, and merge
    by 1x1 conv ('original') or SK fusion."""

    cfg: TransceptionConfig
    concat: str = "original"  # 'original' | 'sk'

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        s1, s2, dilation = _two_branch_schedule(cfg.dil_conv)
        outs = []

        t, H, W = OverlapPatchEmbed(dims[0], 7, 4, 3, dtype=dt,
                                    name="patch_embed1")(x)
        for i in range(layers[0]):
            t = EfficientTransformerBlock(
                dims[0], dims[0], dims[0], token_mlp=cfg.token_mlp,
                dtype=dt, name=f"block1_{i}")(t, H, W)
        t = LayerNorm(dtype=dt, name="norm1")(t)
        m = t.reshape(t.shape[0], H, W, dims[0])
        outs.append(m)

        target = cfg.img_size // 4
        for s in range(1, 4):
            target //= 2
            x1, H1, W1 = OverlapPatchEmbedFuse(
                dims[s], s1["k"][s], 2, s1["p"][s], dilation, dtype=dt,
                name=f"patch_embed{s + 1}_1")(m)
            x2, H2, W2 = OverlapPatchEmbedFuse(
                dims[s], s2["k"][s], 2, s2["p"][s], dilation, dtype=dt,
                name=f"patch_embed{s + 1}_2")(m)
            n1, n2 = x1.shape[1], x2.shape[1]
            cat = jnp.concatenate([x1, x2], axis=1)
            for i in range(layers[s]):
                cat = EfficientTransformerBlockFuse(
                    dims[s], dims[s], dims[s], head_count=cfg.head_count,
                    token_mlp=cfg.token_mlp, dtype=dt,
                    name=f"block{s + 1}_{i}")(
                    cat, (n1, n2), ((H1, W1), (H2, W2)))
            cat = LayerNorm(dtype=dt, name=f"norm{s + 1}")(cat)
            B = cat.shape[0]
            m1 = cat[:, :n1, :].reshape(B, H1, W1, dims[s])
            m2 = cat[:, n1:, :].reshape(B, H2, W2, dims[s])
            m1 = torch_nearest_resize(m1, target, target)
            if self.concat == "original":
                merged = jnp.concatenate([m1, m2], axis=-1)
                m = nn.Conv(dims[s], (1, 1), dtype=dt,
                            param_dtype=jnp.float32, kernel_init=xavier,
                            name=f"conv1_1_s{s + 1}")(merged)
            else:
                m = SKBlock(dims[s], dims[s], num_path=2, reduction=16,
                            dtype=dt, name=f"sk_concat{s + 1}")(
                    [m1, m2], train)
            outs.append(m)
        return outs


class MiT3Inception3Branches(nn.Module):
    """Three-branch variant (Transception.py:553-723): all three branches
    nearest-resized and merged by 1x1 conv."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        s1, s2, s3, dilation = _three_branch_schedule(cfg.dil_conv)
        outs = []

        t, H, W = OverlapPatchEmbed(dims[0], 7, 4, 3, dtype=dt,
                                    name="patch_embed1")(x)
        for i in range(layers[0]):
            t = EfficientTransformerBlock(
                dims[0], dims[0], dims[0], token_mlp=cfg.token_mlp,
                dtype=dt, name=f"block1_{i}")(t, H, W)
        t = LayerNorm(dtype=dt, name="norm1")(t)
        m = t.reshape(t.shape[0], H, W, dims[0])
        outs.append(m)

        target = cfg.img_size // 4
        for s in range(1, 4):
            target //= 2
            branches = []
            for bi, sch in enumerate((s1, s2, s3)):
                xb, Hb, Wb = OverlapPatchEmbedFuse(
                    dims[s], sch["k"][s], 2, sch["p"][s], dilation, dtype=dt,
                    name=f"patch_embed{s + 1}_{bi + 1}")(m)
                branches.append((xb, Hb, Wb))
            lens = [b[0].shape[1] for b in branches]
            sizes = [(b[1], b[2]) for b in branches]
            cat = jnp.concatenate([b[0] for b in branches], axis=1)
            for i in range(layers[s]):
                cat = EfficientTransformerBlockFuse(
                    dims[s], dims[s], dims[s], head_count=cfg.head_count,
                    token_mlp=cfg.token_mlp, dtype=dt,
                    name=f"block{s + 1}_{i}")(cat, lens, sizes)
            cat = LayerNorm(dtype=dt, name=f"norm{s + 1}")(cat)
            B = cat.shape[0]
            maps, off = [], 0
            for (ln, (Hb, Wb)) in zip(lens, sizes):
                mb = cat[:, off:off + ln, :].reshape(B, Hb, Wb, dims[s])
                off += ln
                maps.append(torch_nearest_resize(mb, target, target))
            merged = jnp.concatenate(maps, axis=-1)
            m = nn.Conv(dims[s], (1, 1), dtype=dt, param_dtype=jnp.float32,
                        kernel_init=xavier, name=f"conv1_1_s{s + 1}")(merged)
            outs.append(m)
        return outs


class Transception(nn.Module):
    """Legacy entry model (Transception.py:1010-1057): MiT_3inception
    encoder + the shared 4-stage decoder cascade, no bridge."""

    cfg: TransceptionConfig = TransceptionConfig(head_count=1)
    encoder: str = "3inception"  # '3inception' | '3branches'
    concat: str = "original"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(dt)
        if self.encoder == "3branches":
            enc = MiT3Inception3Branches(cfg, name="backbone")(x, train)
        else:
            enc = MiT3Inception(cfg, self.concat, name="backbone")(x, train)
        d = cfg.dims
        B, h4, w4, c4 = enc[3].shape
        t3 = DecoderLayer(d[3], d[3], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_3")(enc[3].reshape(B, h4 * w4, c4))
        ins = cfg.decoder_in_chans()
        t2 = DecoderLayer(ins[1], d[2], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_2")(t3, enc[2])
        t1 = DecoderLayer(ins[2], d[1], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_1")(t2, enc[1])
        return DecoderLayer(ins[3], d[0], token_mlp=cfg.token_mlp,
                            n_class=cfg.num_classes, is_last=True, dtype=dt,
                            name="decoder_0")(t1, enc[0])


class OverlapPatchEmbedFusePadding(nn.Module):
    """Patch embed that center-pads the map up to a target size before
    flattening (EffSegformer.py:91-114, 'padding before transformer')."""

    dim: int
    patch_size: int
    stride: int
    padding: int
    dilation: int = 1
    target_size: int = 28
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.padding
        y = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=xavier, name="proj")(x)
        B, H1, W1, C = y.shape
        H2 = self.target_size
        if H1 != H2:
            pad = (H2 - H1) // 2
            y = jnp.pad(y, ((0, 0), (pad, H2 - H1 - pad),
                            (pad, H2 - H1 - pad), (0, 0)))
        B, H, W, C = y.shape
        t = LayerNorm(dtype=self.dtype, name="norm")(y.reshape(B, H * W, C))
        return t, H, W


class MiTInception4Stage(nn.Module):
    """4-stage two-branch inception encoder (Transception.py:728-889).

    NB the shipped class passes OverlapPatchEmbeddings_fuse arguments in
    the wrong positions (dilation gets 3 / in_dim, Transception.py:752-762)
    and is dead code; this rebuild uses the intended semantics (dilation 1,
    kernels 7/5 then 3/1, paddings (3,3)/(0,0))."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        k1, p1 = (7, 3, 3, 3), (3, 0, 0, 0)
        k2, p2 = (5, 1, 1, 1), (3, 0, 0, 0)
        strides = (4, 2, 2, 2)
        outs = []
        m = x
        target = cfg.img_size
        for s in range(4):
            target //= strides[s]
            x1, H1, W1 = OverlapPatchEmbedFuse(
                dims[s], k1[s], strides[s], p1[s], 1, dtype=dt,
                name=f"patch_embed{s + 1}_1")(m)
            x2, H2, W2 = OverlapPatchEmbedFuse(
                dims[s], k2[s], strides[s], p2[s], 1, dtype=dt,
                name=f"patch_embed{s + 1}_2")(m)
            n1, n2 = x1.shape[1], x2.shape[1]
            cat = jnp.concatenate([x1, x2], axis=1)
            for i in range(layers[s]):
                cat = EfficientTransformerBlockFuse(
                    dims[s], dims[s], dims[s], head_count=cfg.head_count,
                    token_mlp=cfg.token_mlp, dtype=dt,
                    name=f"block{s + 1}_{i}")(
                    cat, (n1, n2), ((H1, W1), (H2, W2)))
            cat = LayerNorm(dtype=dt, name=f"norm{s + 1}")(cat)
            B = cat.shape[0]
            m1 = cat[:, :n1, :].reshape(B, H1, W1, dims[s])
            m2 = cat[:, n1:, :].reshape(B, H2, W2, dims[s])
            m1 = torch_nearest_resize(m1, target, target)
            m2 = torch_nearest_resize(m2, target, target)
            merged = jnp.concatenate([m1, m2], axis=-1)
            m = nn.Conv(dims[s], (1, 1), dtype=dt, param_dtype=jnp.float32,
                        kernel_init=xavier, name=f"conv1_1_s{s + 1}")(merged)
            outs.append(m)
        return outs


# ---------------------------------------------------------------------------
# MISSFormer family (rebuilt segformer blocks)
# ---------------------------------------------------------------------------


class SegformerSelfAtten(nn.Module):
    """SegFormer spatial-reduction softmax attention (rebuild of the lost
    segformer.py EfficientSelfAtten; structure per MISSFormer/SegFormer:
    strided conv KV reduction by `reduction_ratio`, standard MHA)."""

    dim: int
    head: int
    reduction_ratio: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, C = x.shape
        h = self.head
        d = C // h
        q = _dense(C, "q", self.dtype)(x).reshape(B, N, h, d).transpose(
            0, 2, 1, 3)
        xr = x
        if self.reduction_ratio > 1:
            r = self.reduction_ratio
            mp = x.reshape(B, H, W, C)
            mp = nn.Conv(C, (r, r), strides=(r, r), dtype=self.dtype,
                         param_dtype=jnp.float32, kernel_init=xavier,
                         name="sr")(mp)
            xr = mp.reshape(B, -1, C)
            xr = LayerNorm(dtype=self.dtype, name="sr_norm")(xr)
        kv = _dense(2 * C, "kv", self.dtype)(xr)
        M = xr.shape[1]
        kv = kv.reshape(B, M, 2, h, d).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return _dense(C, "proj", self.dtype)(out)


class SegformerTransformerBlock(nn.Module):
    """LN -> SR-attention -> res -> LN -> MixFFN -> res (rebuild of the lost
    segformer.py TransformerBlock used by MISSFormer decoders/encoder)."""

    dim: int
    head: int
    reduction_ratio: int = 1
    token_mlp: str = "mix_skip"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + SegformerSelfAtten(self.dim, self.head, self.reduction_ratio,
                                   dtype=self.dtype, name="attn")(h, H, W)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x + make_ffn(self.token_mlp, self.dim, self.dim * 4,
                            self.dtype, "mlp")(h, H, W)


class SegformerMiT(nn.Module):
    """Classic 4-stage MiT encoder (rebuild; heads (1,2,5,8), SR ratios
    (8,4,2,1) per the MISSFormer design)."""

    cfg: TransceptionConfig
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        patch = ((7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1))
        outs = []
        m = x
        for s in range(4):
            k, st, p = patch[s]
            t, H, W = OverlapPatchEmbed(dims[s], k, st, p, dtype=dt,
                                        name=f"patch_embed{s + 1}")(m)
            for i in range(layers[s]):
                t = SegformerTransformerBlock(
                    dims[s], self.heads[s], self.sr_ratios[s],
                    token_mlp=cfg.token_mlp, dtype=dt,
                    name=f"block{s + 1}_{i}")(t, H, W)
            t = LayerNorm(dtype=dt, name=f"norm{s + 1}")(t)
            m = t.reshape(t.shape[0], H, W, dims[s])
            outs.append(m)
        return outs


class SegformerDecoderLayer(nn.Module):
    """MISSFormer decoder stage (MISSFormer.py:296-355): like DecoderLayer
    but with SR-attention transformer blocks."""

    in_dim: int
    out_dim: int
    head: int
    reduction_ratio: int
    token_mlp: str = "mix_skip"
    n_class: int = 9
    is_last: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is None:
            B, n, C = x1.shape
            side = int(round(n ** 0.5))
            return PatchExpand(self.out_dim, dtype=self.dtype,
                               name="layer_up")(x1, side, side)
        B, H, W, C = x2.shape
        cat = jnp.concatenate([x1, x2.reshape(B, H * W, C)], axis=-1)
        t = _dense(self.out_dim, "concat_linear", self.dtype)(cat)
        t = SegformerTransformerBlock(
            self.out_dim, self.head, self.reduction_ratio,
            token_mlp=self.token_mlp, dtype=self.dtype,
            name="layer_former_1")(t, H, W)
        t = SegformerTransformerBlock(
            self.out_dim, self.head, self.reduction_ratio,
            token_mlp=self.token_mlp, dtype=self.dtype,
            name="layer_former_2")(t, H, W)
        if self.is_last:
            t = FinalPatchExpandX4(self.out_dim, dtype=self.dtype,
                                   name="layer_up")(t, H, W)
            m = t.reshape(B, 4 * H, 4 * W, self.out_dim)
            return nn.Conv(self.n_class, (1, 1), dtype=jnp.float32,
                           param_dtype=jnp.float32, kernel_init=xavier,
                           name="last_layer")(m.astype(jnp.float32))
        return PatchExpand(self.out_dim, dtype=self.dtype,
                           name="layer_up")(t, H, W)


class MISSFormer(nn.Module):
    """Baseline U-former with the enhanced-context bridge
    (MISSFormer.py:357-405): all-spatial bridge attention (the plain
    BridgeLayer_4, no channel/spatial switch)."""

    cfg: TransceptionConfig = TransceptionConfig()
    if_bridge: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(dt)
        enc = SegformerMiT(cfg, name="backbone")(x, train)
        if self.if_bridge:
            geo = BridgeGeometry(cfg.img_size, cfg.dims, cfg.bridge_dim)
            out = enc
            for i in range(4):
                out = BridgeLayer4(geo, 1, False, cfg.reduction_ratios,
                                   use_pallas=cfg.use_pallas, dtype=dt,
                                   name=f"bridge_layer{i + 1}")(out)
            enc = split_scales(out, geo)
        d = cfg.dims
        heads = (1, 2, 5, 8)
        dec_ratios = (8, 4, 2, 1)
        B, h4, w4, c4 = enc[3].shape
        t3 = SegformerDecoderLayer(
            d[3], d[3], heads[3], dec_ratios[3], token_mlp=cfg.token_mlp,
            n_class=cfg.num_classes, dtype=dt, name="decoder_3")(
            enc[3].reshape(B, h4 * w4, c4))
        ins = cfg.decoder_in_chans()
        t2 = SegformerDecoderLayer(
            ins[1], d[2], heads[2], dec_ratios[2], token_mlp=cfg.token_mlp,
            n_class=cfg.num_classes, dtype=dt, name="decoder_2")(t3, enc[2])
        t1 = SegformerDecoderLayer(
            ins[2], d[1], heads[1], dec_ratios[1], token_mlp=cfg.token_mlp,
            n_class=cfg.num_classes, dtype=dt, name="decoder_1")(t2, enc[1])
        return SegformerDecoderLayer(
            ins[3], d[0], heads[0], dec_ratios[0], token_mlp=cfg.token_mlp,
            n_class=cfg.num_classes, is_last=True, dtype=dt,
            name="decoder_0")(t1, enc[0])


class EffMiT(nn.Module):
    """4-stage MiT with EfficientAttention blocks
    (EfficientMISSFormer.py:108-181)."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        patch = ((7, 4, 3), (3, 2, 1), (3, 2, 1), (3, 2, 1))
        outs = []
        m = x
        for s in range(4):
            k, st, p = patch[s]
            t, H, W = OverlapPatchEmbed(dims[s], k, st, p, dtype=dt,
                                        name=f"patch_embed{s + 1}")(m)
            for i in range(layers[s]):
                t = EfficientTransformerBlock(
                    dims[s], dims[s], dims[s], token_mlp=cfg.token_mlp,
                    dtype=dt, name=f"block{s + 1}_{i}")(t, H, W)
            t = LayerNorm(dtype=dt, name=f"norm{s + 1}")(t)
            m = t.reshape(t.shape[0], H, W, dims[s])
            outs.append(m)
        return outs


class EffMISSFormer(nn.Module):
    """MISSFormer with EfficientAttention encoder/decoder, no bridge
    (EfficientMISSFormer.py:302-340)."""

    cfg: TransceptionConfig = TransceptionConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(dt)
        enc = EffMiT(cfg, name="backbone")(x, train)
        d = cfg.dims
        B, h4, w4, c4 = enc[3].shape
        t3 = DecoderLayer(d[3], d[3], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_3")(enc[3].reshape(B, h4 * w4, c4))
        ins = cfg.decoder_in_chans()
        t2 = DecoderLayer(ins[1], d[2], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_2")(t3, enc[2])
        t1 = DecoderLayer(ins[2], d[1], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_1")(t2, enc[1])
        return DecoderLayer(ins[3], d[0], token_mlp=cfg.token_mlp,
                            n_class=cfg.num_classes, is_last=True, dtype=dt,
                            name="decoder_0")(t1, enc[0])


# ---------------------------------------------------------------------------
# ResInception variant (comment.py) — aborted in the reference, rebuilt.
# ---------------------------------------------------------------------------

_INCEPTION_BRANCHES = {
    "1": ("res",),
    "3": ("3",),
    "5": ("5",),
    "13": ("res", "3"),
    "15": ("res", "5"),
    "135": ("res", "3", "5"),
}


class MiTResInception(nn.Module):
    """MiT_3_ResInception encoder (comment.py:5-203) — dead/unimportable in
    the reference (the file imports only torch+nn, and its own default
    inception key '135' is missing from its block table, comment.py:52-58);
    rebuilt here with the intended semantics:

    stage 1: OverlapPatchEmbeddings(7,4,3) + EfficientTransformerBlocks.
    stages 2-4: a strided overlap patch-embed branch (comment.py:40-47)
    plus a MultiRes inception-conv branch (comment.py:60-63) are fused into
    one token sequence, jointly attended by EfficientTransformerBlockFuse_res
    (comment.py:70-85, 110-113), split back into equal-length per-branch
    maps, channel-concatenated and 1x1-projected to the stage dim
    (comment.py:115-133).

    Documented divergence from the dead code: conv1_1_sX input width is
    derived from the actual branch count ((1+len(branches))*dim) instead of
    the hardcoded (len(inception)+1)*dim, which mismatches for every
    inception choice whose MultiResBlock emits a different number of token
    streams (e.g. '15' emits 2, not 3) — one of the bugs that kept the
    file dead."""

    cfg: TransceptionConfig
    inception: str = "15"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        layers = (2, 2, 2, 2)
        if cfg.dil_conv:
            dilation, pads = 2, (3, 2, 2, 2)  # comment.py:15-19
        else:
            dilation, pads = 1, (3, 1, 1, 1)  # comment.py:21-26
        branches = _INCEPTION_BRANCHES[self.inception]
        from transception_tpu.ops.multires import MultiResBlock
        outs = []

        t, H, W = OverlapPatchEmbed(dims[0], 7, 4, 3, dtype=dt,
                                    name="patch_embed1")(x)
        for i in range(layers[0]):
            t = EfficientTransformerBlock(
                dims[0], dims[0], dims[0], token_mlp=cfg.token_mlp,
                dtype=dt, name=f"block1_{i}")(t, H, W)
        t = LayerNorm(dtype=dt, name="norm1")(t)
        m = t.reshape(t.shape[0], H, W, dims[0])
        outs.append(m)

        for s in range(1, 4):
            x1, H1, W1 = OverlapPatchEmbedFuse(
                dims[s], 3, 2, pads[s], dilation, dtype=dt,
                name=f"patch_embed{s + 1}_1")(m)
            n1 = x1.shape[1]
            # inception branch: maxpool(downsample=2) puts every branch on
            # the same H1 x W1 grid as the patch embed (comment.py:60-63).
            x2 = MultiResBlock(dims[s], branches, downsample=2, dtype=dt,
                               name=f"resInception{s + 1}_2")(m, train)
            cat = jnp.concatenate([x1, x2], axis=1)
            for i in range(layers[s]):
                cat = EfficientTransformerBlockFuseRes(
                    dims[s], dims[s], dims[s], token_mlp=cfg.token_mlp,
                    dtype=dt, name=f"block{s + 1}_{i}")(cat, n1, H1, W1)
            tx = LayerNorm(dtype=dt, name=f"norm{s + 1}")(cat)
            B, tx_len, C = tx.shape
            maps = [tx[:, nz * n1:(nz + 1) * n1, :].reshape(B, H1, W1, C)
                    for nz in range(tx_len // n1)]
            cat_maps = jnp.concatenate(maps, axis=-1)
            m = nn.Conv(dims[s], (1, 1), dtype=dt, param_dtype=jnp.float32,
                        kernel_init=xavier, name=f"conv1_1_s{s + 1}")(cat_maps)
            outs.append(m)
        return outs


class ResInceptionTransception(nn.Module):
    """MiTResInception encoder + the standard 4-stage decoder cascade (no
    bridge), mirroring how the other legacy encoders are assembled into
    models (Transception.py:1010-1057 pattern)."""

    cfg: TransceptionConfig
    inception: str = "15"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(dt)
        enc = MiTResInception(cfg, self.inception, name="backbone")(x, train)
        d = cfg.dims
        ins = cfg.decoder_in_chans()
        B, h4, w4, c4 = enc[3].shape
        t3 = DecoderLayer(d[3], d[3], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_3")(enc[3].reshape(B, h4 * w4, c4))
        t2 = DecoderLayer(ins[1], d[2], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_2")(t3, enc[2])
        t1 = DecoderLayer(ins[2], d[1], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, dtype=dt,
                          name="decoder_1")(t2, enc[1])
        return DecoderLayer(ins[3], d[0], token_mlp=cfg.token_mlp,
                            n_class=cfg.num_classes, is_last=True, dtype=dt,
                            name="decoder_0")(t1, enc[0])
