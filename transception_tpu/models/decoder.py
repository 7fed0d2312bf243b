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
    xavier,
)

Dtype = Any


class DecoderLayer(nn.Module):
    """One decoder stage (MSTr.py:230-290)."""

    in_dim: int      # in_out_chan[0] ('dims' in the reference)
    out_dim: int     # in_out_chan[1]
    token_mlp: str = "mix_skip"
    n_class: int = 9
    is_last: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2: Optional[jnp.ndarray] = None):
        """x1: (B, N, C) tokens from below; x2: (B, H, W, C) skip map."""
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
            dtype=self.dtype, name="layer_former_1")(t, H, W)
        t = EfficientTransformerBlock(
            self.out_dim, self.out_dim, self.out_dim,
            token_mlp=self.token_mlp, use_pallas=self.use_pallas,
            dtype=self.dtype, name="layer_former_2")(t, H, W)
        if self.is_last:
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
