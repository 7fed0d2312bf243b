"""MSViT backbones: the multi-scale RIPM + MB-Transformer encoder.

Behavioral reference: networks/MSTr.py:1350-1441 (MHCA_stage),
:1443-1533 (casa), :1536-1744 (MSViT 3-stage, the published default),
:1746-1988 (MSViT_4Stages), :1990-2204 (MSViT_casa).

Stages emit NHWC maps at /4, /8, /16, /32 with dims (64, 128, 320, 512).
Dead reference params (conv1_1_s1..s4, the unused stage-1 cpe) are omitted.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.core.config import TransceptionConfig
from transception_tpu.ops.attention import EfficientTransformerBlock, MHCAEncoder
from transception_tpu.ops.common import LayerNorm, OverlapPatchEmbed
from transception_tpu.ops.conv import Conv2dBN, PatchEmbedStage, ResBlock
from transception_tpu.ops.fusion import (
    CBAMBlock,
    CBAMBlockCasa,
    Conv3dBNChannelAttentionConcat,
    Conv3dBNConcat,
    CoordAtt,
    SEBlock,
    SKBlock,
)

Dtype = Any


def dpr_schedule(drop_path_rate: float, num_layers):
    """Linear drop-path decay split per stage (MSTr.py:1112-1124)."""
    total = sum(num_layers)
    if total == 0 or drop_path_rate == 0.0:
        return [tuple(0.0 for _ in range(n)) for n in num_layers]
    import numpy as np
    flat = list(np.linspace(0.0, drop_path_rate, total))
    out, cur = [], 0
    for n in num_layers:
        out.append(tuple(float(v) for v in flat[cur:cur + n]))
        cur += n
    return out


class MHCAStage(nn.Module):
    """MB-Transformer stage + IFF fusion (MSTr.py:1350-1441).

    Runs ResBlock on path-0 plus one MHCAEncoder per path, then fuses the
    num_path+1 outputs via the `concat` mode ('coord' default)."""

    embed_dim: int
    out_embed_dim: int
    num_layers: int = 1
    num_heads: int = 8
    mlp_ratio: int = 3
    num_path: int = 4
    concat: str = "coord"
    drop_path_rates: tuple = ()
    use_sa: bool = True
    sa_ker: int = 7
    inter: str = "res"
    casa: bool = False
    vectorize_paths: bool = False
    use_pallas: bool = False
    ffn_fold: object = None  # None -> follow use_pallas (see MHCABlock)
    block_fold: object = None  # None -> follow use_pallas (see MHCABlock)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        att_outputs = [ResBlock(self.embed_dim, dtype=self.dtype,
                                name="inv_res")(inputs[0], train)]
        enc_kwargs = dict(num_layers=self.num_layers,
                          num_heads=self.num_heads,
                          mlp_ratio=self.mlp_ratio,
                          drop_path_rates=self.drop_path_rates,
                          use_pallas=self.use_pallas,
                          ffn_fold=self.ffn_fold,
                          block_fold=self.block_fold, dtype=self.dtype)
        if self.vectorize_paths:
            # One vmapped call over path-stacked params/inputs: identical
            # math to the sequential loop, ~3x faster on TPU (the per-path
            # encoders share shapes, so their matmuls/convs batch).
            VEnc = nn.vmap(
                MHCAEncoder,
                in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            stacked = jnp.stack(inputs)  # (P, B, H, W, C)
            att = VEnc(self.embed_dim, **enc_kwargs,
                       name="mhca_blks_stacked")(stacked, not train)
            att_outputs.extend(att[i] for i in range(len(inputs)))
        else:
            for i, x in enumerate(inputs):
                att_outputs.append(
                    MHCAEncoder(self.embed_dim, **enc_kwargs,
                                name=f"mhca_blks_{i}")(
                        x, deterministic=not train))

        mode = self.concat
        if self.casa:
            # casa dispatch (MSTr.py:1478-1529): only normal/se concatenate.
            if mode == "normal":
                return Conv2dBN(self.out_embed_dim, act="hardswish",
                                dtype=self.dtype, name="aggregate")(
                    jnp.concatenate(att_outputs, axis=-1), train)
            if mode == "se":
                return SEBlock(self.out_embed_dim, r=16, dtype=self.dtype,
                               name="aggregate")(
                    jnp.concatenate(att_outputs, axis=-1), train)
            if mode == "cbam":
                return CBAMBlockCasa(self.out_embed_dim, use_sa=self.use_sa,
                                     kernel_size=self.sa_ker, inter=self.inter,
                                     dtype=self.dtype, name="aggregate")(
                    att_outputs, train)
            if mode == "3d":
                return Conv3dBNConcat(self.out_embed_dim, dtype=self.dtype,
                                      name="aggregate")(att_outputs, train)
            if mode == "skn":
                return SKBlock(self.embed_dim, self.out_embed_dim,
                               num_path=self.num_path + 1, reduction=8,
                               dtype=self.dtype, name="aggregate")(
                    att_outputs, train)
            return Conv3dBNChannelAttentionConcat(
                self.out_embed_dim, cam=mode, dtype=self.dtype,
                name="aggregate")(att_outputs, train)

        if mode in ("normal", "se", "cbam", "coord"):
            cat = jnp.concatenate(att_outputs, axis=-1)
            if mode == "normal":
                return Conv2dBN(self.out_embed_dim, act="hardswish",
                                dtype=self.dtype, name="aggregate")(cat, train)
            if mode == "se":
                return SEBlock(self.out_embed_dim, r=16, dtype=self.dtype,
                               name="aggregate")(cat, train)
            if mode == "cbam":
                return CBAMBlock(self.out_embed_dim, use_sa=self.use_sa,
                                 kernel_size=self.sa_ker, dtype=self.dtype,
                                 name="aggregate")(cat, train)
            return CoordAtt(self.out_embed_dim, reduction=16,
                            dtype=self.dtype, name="aggregate")(cat, train)
        if mode == "3d":
            return Conv3dBNConcat(self.out_embed_dim, dtype=self.dtype,
                                  name="aggregate")(att_outputs, train)
        if mode == "skn":
            return SKBlock(self.embed_dim, self.out_embed_dim,
                           num_path=self.num_path + 1, reduction=8,
                           dtype=self.dtype, name="aggregate")(
                att_outputs, train)
        return Conv3dBNChannelAttentionConcat(
            self.out_embed_dim, cam=mode, dtype=self.dtype,
            name="aggregate")(att_outputs, train)


class MSViT(nn.Module):
    """3-stage default backbone (MSTr.py:1536-1744).

    Stage 1: overlap patch embed (7/4/3) + `stage1_layers` efficient
    transformer blocks + LN. Stages 2-4: RIPM patch-embed stage + MHCA stage.
    Returns the 4 NHWC scale maps."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        outs = []

        # Stage 1.
        t, H, W = OverlapPatchEmbed(dims[0], 7, 4, 3, dtype=dt,
                                    name="patch_embed1")(x)
        for i in range(cfg.stage1_layers):
            t = EfficientTransformerBlock(
                dims[0], dims[0], dims[0], token_mlp=cfg.token_mlp,
                use_pallas=cfg.use_pallas, attn_fold=cfg.etb_attn_fold,
                ffn_fold=cfg.etb_ffn_fold,
                dtype=dt, name=f"block1_{i}")(
                t, H, W)
        t = LayerNorm(dtype=dt, name="norm1")(t)
        m = t.reshape(t.shape[0], H, W, dims[0])
        outs.append(m)

        # Stages 2-4.
        dpr = dpr_schedule(getattr(cfg, "drop_path_rate", 0.0),
                           cfg.num_layers)
        for s in range(3):
            paths = PatchEmbedStage(dims[s], num_path=cfg.num_path[s],
                                    is_pool=True, dtype=dt,
                                    name=f"patch_embed_stage{s + 2}")(m, train)
            # static_argnums counts self as 0, so 2 == `train`.
            stage_cls = (nn.remat(MHCAStage, static_argnums=(2,))
                         if cfg.remat else MHCAStage)
            m = stage_cls(
                dims[s], dims[s + 1], num_layers=cfg.num_layers[s],
                num_heads=cfg.num_heads[s], mlp_ratio=cfg.mlp_ratio,
                num_path=cfg.num_path[s], concat=cfg.concat,
                drop_path_rates=dpr[s],
                use_sa=cfg.use_sa_list[min(s, len(cfg.use_sa_list) - 1)],
                sa_ker=cfg.sa_ker, vectorize_paths=cfg.vectorize_paths,
                use_pallas=cfg.use_pallas, ffn_fold=cfg.mhca_ffn_fold,
                block_fold=cfg.mhca_block_fold, dtype=dt,
                name=f"mhca_stage{s + 2}")(paths, train)
            outs.append(m)
        return outs


class MSViT4Stages(nn.Module):
    """All-4-stages-MHCA variant (MSTr.py:1746-1988): conv stem
    (2x Conv2d_BN stride 2), num_path (2,3,3,3), num_layers (1,3,8,3)."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        num_path = (2, 3, 3, 3)
        num_layers = (1, 3, 8, 3)
        num_heads = (8, 8, 8, 8)

        m = Conv2dBN(dims[0] // 2, kernel_size=3, stride=2, pad=1,
                     act="hardswish", dtype=dt, name="stem_0")(x, train)
        m = Conv2dBN(dims[0], kernel_size=3, stride=2, pad=1,
                     act="hardswish", dtype=dt, name="stem_1")(m, train)

        outs = []
        in_dims = (dims[0], dims[0], dims[1], dims[2])
        out_dims = (dims[0], dims[1], dims[2], dims[3])
        dpr = dpr_schedule(getattr(cfg, "drop_path_rate", 0.0), num_layers)
        for s in range(4):
            paths = PatchEmbedStage(in_dims[s], num_path=num_path[s],
                                    is_pool=(s > 0), dtype=dt,
                                    name=f"patch_embed_stage{s + 1}")(m, train)
            m = MHCAStage(
                in_dims[s], out_dims[s], num_layers=num_layers[s],
                num_heads=num_heads[s], mlp_ratio=cfg.mlp_ratio,
                num_path=num_path[s], concat=cfg.concat,
                drop_path_rates=dpr[s],
                use_sa=cfg.use_sa_list[min(s, len(cfg.use_sa_list) - 1)],
                sa_ker=cfg.sa_ker, vectorize_paths=cfg.vectorize_paths,
                use_pallas=cfg.use_pallas, ffn_fold=cfg.mhca_ffn_fold,
                block_fold=cfg.mhca_block_fold, dtype=dt,
                name=f"mhca_stage{s + 1}")(paths, train)
            outs.append(m)
        return outs


class MSViTCasa(nn.Module):
    """3-stage variant with MHCA_stage_casa fusion (MSTr.py:1990-2204)."""

    cfg: TransceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dims = cfg.dims
        outs = []

        t, H, W = OverlapPatchEmbed(dims[0], 7, 4, 3, dtype=dt,
                                    name="patch_embed1")(x)
        for i in range(cfg.stage1_layers):
            t = EfficientTransformerBlock(
                dims[0], dims[0], dims[0], token_mlp=cfg.token_mlp,
                use_pallas=cfg.use_pallas, attn_fold=cfg.etb_attn_fold,
                ffn_fold=cfg.etb_ffn_fold,
                dtype=dt, name=f"block1_{i}")(
                t, H, W)
        t = LayerNorm(dtype=dt, name="norm1")(t)
        m = t.reshape(t.shape[0], H, W, dims[0])
        outs.append(m)

        for s in range(3):
            paths = PatchEmbedStage(dims[s], num_path=cfg.num_path[s],
                                    is_pool=True, dtype=dt,
                                    name=f"patch_embed_stage{s + 2}")(m, train)
            m = MHCAStage(
                dims[s], dims[s + 1], num_layers=cfg.num_layers[s],
                num_heads=cfg.num_heads[s], mlp_ratio=cfg.mlp_ratio,
                num_path=cfg.num_path[s], concat=cfg.concat,
                use_sa=cfg.use_sa_list[min(s, len(cfg.use_sa_list) - 1)],
                sa_ker=cfg.sa_ker, inter=cfg.inter, casa=True,
                vectorize_paths=cfg.vectorize_paths,
                use_pallas=cfg.use_pallas, ffn_fold=cfg.mhca_ffn_fold,
                block_fold=cfg.mhca_block_fold, dtype=dt,
                name=f"mhca_stage{s + 2}")(paths, train)
            outs.append(m)
        return outs
