"""MSTransception — the flagship model (networks/MSTr.py:2759-2852).

Backbone (3/4-stage/casa MSViT) -> optional bridge -> 4-stage decoder
cascade. NHWC in/out: input (B, H, W, 1|3), output (B, H, W, num_classes)
fp32 logits. Grayscale inputs are repeated to 3 channels (MSTr.py:2828-2829).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.core.config import TransceptionConfig
from transception_tpu.models.bridge import (
    BridgeBlock4,
    BridgeBlockPara,
    BridgeBlockSp,
    BridgeGeometry,
)
from transception_tpu.models.decoder import DecoderLayer
from transception_tpu.models.msvit import MSViT, MSViT4Stages, MSViTCasa


class MSTransception(nn.Module):
    """U-shaped hierarchical transformer for 2D medical image segmentation."""

    cfg: TransceptionConfig = TransceptionConfig()

    @nn.compact
    def __call__(self, x, train: bool = False, argmax: bool = False,
                 wide_head: bool = False):
        """argmax=True (inference only): return (B, H, W) uint8 class ids
        instead of logits, with the head conv + argmax computed BEFORE the
        final pixel shuffle (they commute with it exactly; kills the two
        measured-expensive (B, N, 16·dim) layout copies — see
        DecoderLayer.argmax_head). Same params either way.

        wide_head=True (training only): return (B, (H/4)², 16, num_classes)
        fp32 logits in PRE-pixel-shuffle token order; the loss permutes
        the integer labels instead (train/losses.py shuffle_labels_wide).
        Kills the final shuffle + LN re-tiling copies from fwd AND bwd —
        see DecoderLayer.wide_head. Same params either way."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x.astype(dt)

        # ---- Encoder ----
        if cfg.stage_3or4 == 4:
            backbone = MSViT4Stages(cfg, name="backbone")
        elif cfg.stage_3or4 == 3:
            backbone = MSViT(cfg, name="backbone")
        else:
            backbone = MSViTCasa(cfg, name="backbone")
        enc = backbone(x, train)

        # ---- Bridge ----
        geo = BridgeGeometry(cfg.img_size, cfg.dims, cfg.bridge_dim)
        bridge_kind = cfg.have_bridge
        bridge_pallas = (cfg.use_pallas if cfg.bridge_use_pallas is None
                         else bool(cfg.bridge_use_pallas))
        if bridge_kind not in ("none", "None"):
            if bridge_kind == "sp":
                enc = BridgeBlockSp(geo, cfg.bridge_heads, cfg.num_sp,
                                    cfg.reduction_ratios,
                                    use_pallas=bridge_pallas, dtype=dt,
                                    name="bridge")(enc, deterministic=not train)
            elif bridge_kind == "para":
                enc = BridgeBlockPara(geo, cfg.bridge_heads,
                                      cfg.reduction_ratios,
                                      use_pallas=bridge_pallas, dtype=dt,
                                      name="bridge")(enc)
            else:  # 'original' and any other value (MSTr.py:2802-2809)
                enc = BridgeBlock4(geo, cfg.bridge_heads, cfg.br_ch_att_list,
                                   cfg.reduction_ratios,
                                   seq_shard_axis=cfg.bridge_seq_shard_axis,
                                   use_pallas=bridge_pallas,
                                   ffn_use_pallas=cfg.bridge_ffn_use_pallas,
                                   attn_fold=cfg.bridge_attn_fold,
                                   dtype=dt, name="bridge")(enc)

        # ---- Decoder ----
        # in_out_chan (MSTr.py:2814): [dim, out_dim, key_dim, value_dim];
        # in_dims derived from cfg.dims (512/288/144/32 at the defaults).
        d = cfg.dims
        ins = cfg.decoder_in_chans()
        B, h4, w4, c4 = enc[3].shape
        t3 = enc[3].reshape(B, h4 * w4, c4)
        t3 = DecoderLayer(ins[0], d[3], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, use_pallas=cfg.use_pallas,
                          attn_fold=cfg.etb_attn_fold,
                          ffn_fold=cfg.etb_ffn_fold,
                          dtype=dt, name="decoder_3")(t3)
        t2 = DecoderLayer(ins[1], d[2], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, use_pallas=cfg.use_pallas,
                          attn_fold=cfg.etb_attn_fold,
                          ffn_fold=cfg.etb_ffn_fold,
                          dtype=dt, name="decoder_2")(t3, enc[2])
        t1 = DecoderLayer(ins[2], d[1], token_mlp=cfg.token_mlp,
                          n_class=cfg.num_classes, use_pallas=cfg.use_pallas,
                          attn_fold=cfg.etb_attn_fold,
                          ffn_fold=cfg.etb_ffn_fold,
                          dtype=dt, name="decoder_1")(t2, enc[1])
        logits = DecoderLayer(ins[3], d[0], token_mlp=cfg.token_mlp,
                              n_class=cfg.num_classes, is_last=True,
                              use_pallas=cfg.use_pallas,
                              attn_fold=cfg.etb_attn_fold,
                              ffn_fold=cfg.etb_ffn_fold, dtype=dt,
                              name="decoder_0")(t1, enc[0],
                                                argmax_head=argmax,
                                                wide_head=wide_head)
        return logits
